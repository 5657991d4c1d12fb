"""TermLogger terminal UI (parity target: /root/reference/logger.py:6-59)."""
import io

from cc_tpu.utils.term import ProgressBar, TermLogger, Writer


class FakeTTY(io.StringIO):
    def isatty(self):
        return True


def test_writer_non_tty_plain_print():
    buf = io.StringIO()
    w = Writer((0, 5), stream=buf)
    w.write("hello")
    assert buf.getvalue() == "hello\n"


def test_writer_tty_cursor_addressing():
    buf = FakeTTY()
    w = Writer((0, 5), stream=buf)
    w.write("hello")
    out = buf.getvalue()
    assert "\033[6;1H" in out        # CUP to row 6 (1-based), col 1
    assert "\033[K" in out           # clear line
    assert out.startswith("\0337") and out.endswith("\0338")  # save/restore
    assert "hello" in out


def test_progressbar_renders_fraction():
    buf = FakeTTY()
    bar = ProgressBar(10, Writer((0, 0), stream=buf), width=10).start()
    bar.update(5)
    bar.finish()
    out = buf.getvalue()
    assert " 50% |#####     | 5/10" in out
    assert "100% |##########| 10/10" in out


def test_progressbar_clamps_and_dedups():
    buf = FakeTTY()
    bar = ProgressBar(4, Writer((0, 0), stream=buf), width=4).start()
    bar.update(99)  # clamped to maxval
    assert "4/4" in buf.getvalue()
    n = len(buf.getvalue())
    bar.update(99)  # same value: no re-render
    assert len(buf.getvalue()) == n


def test_term_logger_layout_and_reset_non_tty():
    buf = io.StringIO()
    tl = TermLogger(n_epochs=3, train_size=7, valid_size=5, stream=buf)
    tl.epoch_bar.start()
    tl.epoch_bar.update(1)
    tl.train_bar.update(3)
    tl.train_writer.write("Train: Loss 1.0")
    tl.reset_train_bar()
    assert tl.train_bar.currval == 0
    tl.valid_bar.update(2)
    tl.reset_valid_bar()
    assert tl.valid_bar.currval == 0
    # non-TTY: bars silent, writer lines printed
    assert buf.getvalue() == "Train: Loss 1.0\n"
