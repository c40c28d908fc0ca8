// Minimal OpenCV stub for the Atari-mode parity build.
//
// The reference's AtariEnv (atari.cpp:141-161) only uses cv to resize the
// ALE screen to 96x96. The stub ALE (ale_interface.hpp) already emits
// 96x96 screens, so resize here is an identity copy — interpolation
// semantics never enter the parity comparison. Anything else aborts.
#pragma once

#include <cstdlib>
#include <cstring>
#include <vector>

#define CV_8UC3 16

namespace cv {

struct Size {
    int width, height;
    Size(int w, int h) : width(w), height(h) {}
};

struct Mat {
    int rows = 0, cols = 0, type_ = 0;
    std::vector<unsigned char> store;
    unsigned char* data = nullptr;

    Mat() = default;
    Mat(int r, int c, int type, void* external)
        : rows(r), cols(c), type_(type), data(static_cast<unsigned char*>(external)) {}

    template <typename T>
    T& at(int flat_index)
    {
        return *(reinterpret_cast<T*>(data) + flat_index);
    }
};

const int INTER_AREA = 3;

inline void resize(const Mat& src, Mat& dst, Size sz, double, double, int)
{
    if (src.rows != sz.height || src.cols != sz.width) {
        std::abort(); // stub only supports identity resize (96x96 -> 96x96)
    }
    dst.rows = sz.height;
    dst.cols = sz.width;
    dst.type_ = src.type_;
    dst.store.resize(static_cast<size_t>(sz.height) * sz.width * 3);
    std::memcpy(dst.store.data(), src.data, dst.store.size());
    dst.data = dst.store.data();
}

} // namespace cv
