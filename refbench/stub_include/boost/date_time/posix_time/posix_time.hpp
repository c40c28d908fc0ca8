// Minimal boost::posix_time shim (std::chrono-backed) so the reference
// sources compile on this image, which has no boost. Only the surface used
// by minizero/utils/time_system.h and actor/zero_actor.cpp is provided.
#pragma once

#include <chrono>
#include <ctime>

namespace boost {
namespace posix_time {

class time_duration {
public:
    long long us_ = 0;
    time_duration(long long us = 0) : us_(us) {}
    long long hours() const { return us_ / 3600000000LL; }
    long long minutes() const { return (us_ / 60000000LL) % 60; }
    long long seconds() const { return (us_ / 1000000LL) % 60; }
    long long total_milliseconds() const { return us_ / 1000; }
    long long total_microseconds() const { return us_; }
};

struct ptime_date {
    int y = 1970, m = 1, d = 1;
    int year() const { return y; }
    int month() const { return m; }
    int day() const { return d; }
};

class ptime {
public:
    std::chrono::system_clock::time_point tp_;
    ptime() = default;
    explicit ptime(std::chrono::system_clock::time_point tp) : tp_(tp) {}

    ptime_date date() const
    {
        std::time_t t = std::chrono::system_clock::to_time_t(tp_);
        std::tm tm_buf;
        localtime_r(&t, &tm_buf);
        return {tm_buf.tm_year + 1900, tm_buf.tm_mon + 1, tm_buf.tm_mday};
    }

    time_duration time_of_day() const
    {
        std::time_t t = std::chrono::system_clock::to_time_t(tp_);
        std::tm tm_buf;
        localtime_r(&t, &tm_buf);
        long long us_within_s =
            std::chrono::duration_cast<std::chrono::microseconds>(
                tp_.time_since_epoch())
                .count() %
            1000000LL;
        if (us_within_s < 0) { us_within_s += 1000000LL; }
        return time_duration(((tm_buf.tm_hour * 60LL + tm_buf.tm_min) * 60LL + tm_buf.tm_sec) * 1000000LL + us_within_s);
    }
};

inline time_duration operator-(const ptime& a, const ptime& b)
{
    return time_duration(
        std::chrono::duration_cast<std::chrono::microseconds>(a.tp_ - b.tp_).count());
}

struct microsec_clock {
    static ptime local_time() { return ptime(std::chrono::system_clock::now()); }
};

} // namespace posix_time
} // namespace boost
