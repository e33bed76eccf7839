"""TUI logic tests: parameter validation, command construction, rendering."""

import os
import sys

import pytest

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

from scripts.ui import DEFAULT_PARAMS, build_command, validate  # noqa: E402


def test_validate_weight_sum():
    p = dict(DEFAULT_PARAMS)
    p["perceptual_weight"] = 0.4
    assert validate("ssim_weight", "0.5", p) == 0.5
    with pytest.raises(ValueError, match="<= 1"):
        validate("ssim_weight", "0.7", p)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        validate("ssim_weight", "1.5", p)


def test_validate_crop_factor_and_ints():
    p = dict(DEFAULT_PARAMS)
    assert validate("kspace_crop_factor", "0.25", p) == 0.25
    with pytest.raises(ValueError):
        validate("kspace_crop_factor", "0", p)
    with pytest.raises(ValueError):
        validate("kspace_crop_factor", "1.2", p)
    assert validate("batch_size", "16", p) == 16
    with pytest.raises(ValueError):
        validate("batch_size", "-1", p)
    with pytest.raises(ValueError):
        validate("target_size", "256", p)
    assert validate("target_size", "128 128", p) == "128 128"


def test_build_commands():
    p = dict(DEFAULT_PARAMS)
    p["augmentation"] = True
    p["cpu"] = True
    cmd = build_command("train", p)
    assert "--augmentation" in cmd and "--cpu" in cmd
    assert cmd[cmd.index("--ssim_weight") + 1] == "0.3"
    assert cmd[1].endswith("train.py")
    assert "--qat" not in cmd                    # QAT toggle defaults off
    p["qat"] = True
    assert "--qat" in build_command("train", p)
    p["qat"] = False

    p["input_image"] = "in.png"
    p["checkpoint_file"] = "ckpt/best.ckpt"
    cmd = build_command("infer", p)
    assert cmd[cmd.index("--checkpoint_path") + 1] == "ckpt/best.ckpt"
    assert "--show_comparison" in cmd
    assert "--quant" not in cmd                  # int8 toggle defaults off
    p["quant_int8"] = True
    cmd = build_command("infer", p)
    assert cmd[cmd.index("--quant") + 1] == "int8"

    cmd = build_command("extract_paired", p)
    i = cmd.index("--target_size")
    assert cmd[i + 1:i + 3] == ["256", "256"]

    cmd = build_command("serve", p)
    assert cmd[1].endswith("serve.py")
    assert cmd[cmd.index("--port") + 1] == "8476"
    assert cmd[cmd.index("--max_batch") + 1] == "64"
    assert cmd[cmd.index("--checkpoint_path") + 1] == "ckpt/best.ckpt"
    assert cmd[cmd.index("--quant") + 1] == "int8"  # toggle still on
    assert "--cpu" in cmd


def test_tui_renders_and_quits():
    """Launch under a pty, check the main menu renders, quit with q."""
    import pty
    import select
    import signal
    import time

    pid, fd = pty.fork()
    if pid == 0:
        os.environ["TERM"] = "xterm"
        os.execvp(sys.executable,
                  [sys.executable,
                   os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "ui.py")])
    out = b""
    try:
        deadline = time.time() + 15
        while time.time() < deadline:
            if select.select([fd], [], [], 0.3)[0]:
                try:
                    out += os.read(fd, 65536)
                except OSError:
                    break
            if b"Train Super-Resolution Model" in out:
                break
        assert b"MRI Super-Resolution Tool" in out
        assert b"Extract Paired Slices" in out
        assert b"Train Super-Resolution Model" in out
        os.write(fd, b"q")
        deadline = time.time() + 10
        while time.time() < deadline:
            done, _ = os.waitpid(pid, os.WNOHANG)
            if done:
                pid = 0
                break
            time.sleep(0.2)
        assert pid == 0, "TUI did not exit on 'q'"
    finally:
        if pid:
            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)
        os.close(fd)


def test_tui_extract_flow_end_to_end(tmp_path):
    """Drive the real TUI: edit params, toggle cpu, launch the extraction
    subprocess from the menu, verify PNGs land, return, quit."""
    import pty
    import select
    import signal
    import time
    import glob

    pytest.importorskip("cv2")
    import numpy as np
    from mri_superresolution_tpu import nifti

    anat = tmp_path / "datasets" / "s1" / "sub-01" / "anat"
    anat.mkdir(parents=True)
    vol = (np.random.default_rng(0).random((24, 20, 16)) * 300).astype(
        np.float32)
    nifti.save(str(anat / "sub-01_T1w.nii"), vol)
    (tmp_path / "hr").mkdir()
    (tmp_path / "lr").mkdir()

    pid, fd = pty.fork()
    if pid == 0:
        os.environ["TERM"] = "xterm"
        os.environ["ESCDELAY"] = "200"
        os.chdir(tmp_path)
        os.execvp(sys.executable,
                  [sys.executable,
                   os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "ui.py")])

    out = b""

    def drain(t=0.3):
        nonlocal out
        while select.select([fd], [], [], t)[0]:
            try:
                out += os.read(fd, 65536)
            except OSError:
                return

    def send(s, wait=0.4):
        os.write(fd, s.encode())
        time.sleep(wait)
        drain()

    DOWN = "\x1bOB"  # SS3 arrow (curses smkx keypad-transmit mode)
    try:
        time.sleep(2)
        drain()
        send("\r", 1.0)                          # Extract menu
        send("\r", 0.4); send("./datasets\r", 0.5)   # datasets_dir
        send(DOWN); send("\r", 0.4); send("./hr\r", 0.5)
        send(DOWN); send("\r", 0.4); send("./lr\r", 0.5)
        send(DOWN); send("\r", 0.4); send("3\r", 0.5)   # n_slices
        send(DOWN); send("\r", 0.4); send("\r", 0.3)    # lower (keep)
        # from lower_percent(4) to cpu(9): upper, target, noise, kspace, cpu
        for _ in range(5):
            send(DOWN, 0.12)
        send("\r", 0.4)                          # toggle cpu -> True
        send(DOWN, 0.2)
        send("\r", 2.0)                          # Run
        deadline = time.time() + 240
        while time.time() < deadline and b"Press Enter" not in out:
            drain(0.5)
        send("\r", 0.8)
        send("q", 0.3)
        send("q", 0.3)
        text = out.decode(errors="replace")
        assert "extract_paired_slices.py" in text
        assert "completed successfully" in text
        hr = glob.glob(str(tmp_path / "hr" / "*.png"))
        lr = glob.glob(str(tmp_path / "lr" / "*.png"))
        assert len(hr) == 3 and len(lr) == 3
    finally:
        try:
            os.kill(pid, signal.SIGKILL)
            os.waitpid(pid, 0)
        except (ProcessLookupError, ChildProcessError):
            pass
        os.close(fd)
