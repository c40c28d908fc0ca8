// boost::thread shim for compiling the reference's Paralleler-based code
// (utils/paralleler.h, learner/data_loader.cpp) without boost in this image.
// std::thread-backed; API-compatible for the SUBSET the compiled sources use:
// boost::barrier (reusable, generation-counted), boost::thread_group
// (create_thread / interrupt_all / join_all), boost::bind.
//
// Semantics caveat (scaffolding, not framework code): boost interrupts
// threads parked at interruption points; std::thread cannot. The reference's
// slave threads loop forever on their start barrier, so join_all() DETACHES
// instead of joining — the threads die with the process, which is exactly
// when the reference destroys its parallelers too.
#pragma once

#include <condition_variable>
#include <functional>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

namespace boost {

class barrier {
public:
    explicit barrier(unsigned count) : threshold_(count), count_(count), generation_(0) {}

    void wait()
    {
        std::unique_lock<std::mutex> lock(m_);
        auto gen = generation_;
        if (--count_ == 0) {
            ++generation_;
            count_ = threshold_;
            cv_.notify_all();
        } else {
            cv_.wait(lock, [this, gen] { return gen != generation_; });
        }
    }

private:
    std::mutex m_;
    std::condition_variable cv_;
    const unsigned threshold_;
    unsigned count_;
    unsigned long generation_;
};

class thread_group {
public:
    ~thread_group()
    {
        join_all();
    }

    template <typename F>
    void create_thread(F f)
    {
        threads_.emplace_back(std::thread(std::move(f)));
    }

    void interrupt_all() {}  // no interruption points with std::thread

    void join_all()
    {
        // the reference's slave threads never exit their run loop; detach so
        // process teardown reclaims them (see header comment)
        for (auto& t : threads_) {
            if (t.joinable()) { t.detach(); }
        }
        threads_.clear();
    }

private:
    std::vector<std::thread> threads_;
};

using std::bind;

} // namespace boost
