"""Progress bar (utils/progress.py — counterpart of reference utils/tqdm.h)."""

import io

from minizero_tpu.utils.progress import ProgressBar, progress


class FakeTTY(io.StringIO):
    def isatty(self):
        return True


def test_disabled_on_non_tty():
    out = io.StringIO()
    with ProgressBar(10, "x ", stream=out) as bar:
        for _ in range(10):
            bar.step()
    assert out.getvalue() == ""


def test_renders_on_tty():
    out = FakeTTY()
    with ProgressBar(4, "load ", stream=out, min_interval_s=0.0) as bar:
        for _ in range(4):
            bar.step()
    text = out.getvalue()
    assert "load " in text and "100%" in text and "4/4" in text
    assert text.endswith("\n")


def test_progress_iterator():
    assert list(progress([1, 2, 3], "it ")) == [1, 2, 3]
