// Minimal boost::iostreams shim backed by zlib (gzip format), covering the
// exact usage in minizero/utils/utils.h: filtering_streambuf push of a
// gzip_{compressor,decompressor} + a stream / array source, then copy().
#pragma once

#include <cstring>
#include <ostream>
#include <stdexcept>
#include <string>
#include <zlib.h>

namespace boost {
namespace iostreams {

struct output {};
struct input {};
struct gzip_compressor {};
struct gzip_decompressor {};

template <typename CharT>
struct basic_array_source {
    const CharT* data_ = nullptr;
    size_t size_ = 0;
    basic_array_source() = default;
    basic_array_source(const CharT* d, size_t n) : data_(d), size_(n) {}
};

template <typename Mode>
class filtering_streambuf {
public:
    bool gzip_ = false;
    std::ostream* sink_ = nullptr;
    basic_array_source<char> src_;

    void push(const gzip_compressor&) { gzip_ = true; }
    void push(const gzip_decompressor&) { gzip_ = true; }
    void push(std::ostream& os) { sink_ = &os; }
    void push(const basic_array_source<char>& s) { src_ = s; }
};

namespace detail {

inline void gzip_transform(const char* data, size_t size, std::ostream& out, bool compress)
{
    z_stream zs;
    std::memset(&zs, 0, sizeof(zs));
    // windowBits 15 + 16 selects the gzip wrapper
    if (compress) {
        if (deflateInit2(&zs, Z_DEFAULT_COMPRESSION, Z_DEFLATED, 15 + 16, 8, Z_DEFAULT_STRATEGY) != Z_OK) {
            throw std::runtime_error("deflateInit2 failed");
        }
    } else {
        if (inflateInit2(&zs, 15 + 16) != Z_OK) { throw std::runtime_error("inflateInit2 failed"); }
    }
    zs.next_in = reinterpret_cast<Bytef*>(const_cast<char*>(data));
    zs.avail_in = static_cast<uInt>(size);
    char buf[1 << 15];
    int ret = Z_OK;
    do {
        zs.next_out = reinterpret_cast<Bytef*>(buf);
        zs.avail_out = sizeof(buf);
        ret = compress ? deflate(&zs, Z_FINISH) : inflate(&zs, Z_FINISH);
        if (ret != Z_OK && ret != Z_STREAM_END && ret != Z_BUF_ERROR) {
            compress ? deflateEnd(&zs) : inflateEnd(&zs);
            throw std::runtime_error("zlib transform failed");
        }
        out.write(buf, sizeof(buf) - zs.avail_out);
    } while (ret != Z_STREAM_END);
    compress ? deflateEnd(&zs) : inflateEnd(&zs);
}

} // namespace detail

// compress path: copy(array_source, filtering_streambuf<output>)
inline void copy(const basic_array_source<char>& src, filtering_streambuf<output>& out)
{
    if (!out.sink_) { throw std::runtime_error("no sink pushed"); }
    detail::gzip_transform(src.data_, src.size_, *out.sink_, /*compress=*/true);
}

// decompress path: copy(filtering_streambuf<input>, ostream)
inline void copy(filtering_streambuf<input>& in, std::ostream& out)
{
    detail::gzip_transform(in.src_.data_, in.src_.size_, out, /*compress=*/false);
}

template <typename Mode>
inline void close(filtering_streambuf<Mode>&) {}

} // namespace iostreams
} // namespace boost
