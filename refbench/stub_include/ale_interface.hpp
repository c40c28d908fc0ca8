// Deterministic stub ALE for the Atari-mode reference-parity build.
//
// The build image has no ale_py/ROMs, so the ATARI=1 parity binary links
// against this fake console instead: 96x96 screens, rewards, and lives are
// pure uint32-hash functions of (seed, frame[, action]) that
// tests/parity_common.py replicates bit-for-bit in numpy
// (parity_fake_ale_*). Screens are emitted at the target 96x96 resolution
// so the reference's cv::resize (stubbed in opencv2/opencv.hpp) is an
// identity copy and no interpolation semantics enter the comparison.
//
// This models the parts of the real ALEInterface the reference's AtariEnv
// touches (atari.cpp:54-100): setInt/setFloat/loadROM/reset_game/act/
// lives/game_over/getScreenRGB/getScreen/getMinimalActionSet. Sticky
// actions (repeat_action_probability) are intentionally ignored — parity
// games must be deterministic.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace ale {

enum Action {
    PLAYER_A_NOOP = 0,
    // the reference only converts ids 0..17; names are cosmetic
};

inline std::string action_to_string(Action a)
{
    static const char* kNames[18] = {
        "NOOP", "FIRE", "UP", "RIGHT", "LEFT", "DOWN",
        "UPRIGHT", "UPLEFT", "DOWNRIGHT", "DOWNLEFT",
        "UPFIRE", "RIGHTFIRE", "LEFTFIRE", "DOWNFIRE",
        "UPRIGHTFIRE", "UPLEFTFIRE", "DOWNRIGHTFIRE", "DOWNLEFTFIRE"};
    int id = static_cast<int>(a);
    return (id >= 0 && id < 18) ? kNames[id] : "NOOP";
}

struct Logger {
    enum class mode { Error };
    static void setMode(mode) {}
};

class ALEInterface {
public:
    static const int kRes = 96;
    static const int kEpisodeFrames = 800;

    struct Screen {
        int height() const { return kRes; }
        int width() const { return kRes; }
    };

    void setInt(const std::string& key, int value)
    {
        if (key == "random_seed") { seed_ = static_cast<uint32_t>(value); }
    }
    void setFloat(const std::string&, float) {}
    void loadROM(const std::string&) {}
    void reset_game() { frame_ = 0; }

    // one emulator frame: python twin parity_fake_ale_reward()
    float act(Action action)
    {
        frame_ += 1;
        uint32_t x = static_cast<uint32_t>(frame_) * 2654435761u;
        x ^= seed_ * 97u;
        x ^= static_cast<uint32_t>(action) * 31u;
        x ^= x >> 15;
        x *= 2246822519u;
        return ((x >> 20) % 16u == 0u) ? 1.0f : 0.0f;
    }

    int lives() const
    {
        int l = 3 - frame_ / 350;
        return l < 0 ? 0 : l;
    }
    bool game_over(bool = false) const { return frame_ >= kEpisodeFrames; }
    int getFrameNumber() const { return frame_; }
    int getEpisodeFrameNumber() const { return frame_; }

    // 96x96x3 interleaved HWC bytes: python twin parity_fake_ale_screen()
    void getScreenRGB(std::vector<unsigned char>& out) const
    {
        out.resize(kRes * kRes * 3);
        for (uint32_t i = 0; i < out.size(); ++i) {
            uint32_t x = i * 2654435761u;
            x ^= static_cast<uint32_t>(frame_) * 2246822519u;
            x ^= seed_ * 3266489917u;
            x ^= x >> 15;
            x *= 2654435761u;
            out[i] = static_cast<unsigned char>((x >> 16) & 0xFFu);
        }
    }

    const Screen& getScreen() const { return screen_; }

    std::vector<Action> getMinimalActionSet() const
    {
        static const int kSet[8] = {0, 1, 2, 3, 4, 5, 11, 17};
        std::vector<Action> v;
        for (int id : kSet) { v.push_back(static_cast<Action>(id)); }
        return v;
    }

private:
    uint32_t seed_ = 0;
    int frame_ = 0;
    Screen screen_;
};

} // namespace ale
