"""CLI round-trips — the main.cpp-compatible surface (SURVEY §2.1 #12):
default grid scene, obj file, mode selection, TIME/AVG. TIME output, PNG
and GIF artifacts."""

import os
import re

import numpy as np
import pytest

from sgrt_tpu.cli import main


def test_cli_grid_png(tmp_path, capsys):
    out = tmp_path / "grid.png"
    rc = main(["-g", "2", "-w", "32", "-h", "32", "-q", "-o", str(out),
               "--tiles", "2", "-m", "8"])
    assert rc in (0, None)
    captured = capsys.readouterr().out
    assert "TIME:" in captured          # main.cpp:310-316 format
    data = out.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_obj_untiled_mode(tmp_path, capsys):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
    out = tmp_path / "tri.png"
    rc = main(["-f", str(obj), "-w", "16", "-h", "16", "-q", "-o", str(out),
               "-m", "1"])                      # mode 1-4 = untiled
    assert rc in (0, None)
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_cli_frames_avg_time(capsys):
    """Reference prints per-frame TIME only for nr_frames==1, AVG. TIME
    for multi-frame runs (main.cpp:310-316) — match exactly."""
    rc = main(["-g", "2", "-w", "16", "-h", "16", "-q", "--frames", "3",
               "--tiles", "2"])
    assert rc in (0, None)
    outp = capsys.readouterr().out
    assert "AVG. TIME:" in outp
    assert re.search(r"AVG\. TIME: [\d.]+ ms \(3 frames\)", outp)
    assert "TIME:" not in outp.replace("AVG. TIME:", "")


def test_cli_gif(tmp_path):
    out = tmp_path / "orbit.gif"
    rc = main(["-g", "2", "-w", "16", "-h", "16", "-q", "--frames", "2",
               "--tiles", "2", "--gif", str(out)])
    assert rc in (0, None)
    assert out.read_bytes()[:6] in (b"GIF87a", b"GIF89a")


def test_cli_aniso_flag(tmp_path, capsys):
    """--aniso SX,SY,SZ renders via the anisotropic pipeline and actually
    changes the image vs the isotropic render."""
    iso = tmp_path / "iso.png"
    ani = tmp_path / "ani.png"
    common = ["-g", "2", "-w", "32", "-h", "32", "-q", "--tiles", "2",
              "-m", "8"]
    assert main(common + ["-o", str(iso)]) in (0, None)
    assert main(common + ["-o", str(ani), "--aniso", "2.0,0.5,1.0"]) in (0, None)
    from PIL import Image

    a = np.asarray(Image.open(iso), np.float32)
    b = np.asarray(Image.open(ani), np.float32)
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) > 2.0   # visibly different


def test_fit_cli_roundtrip(tmp_path, capsys):
    """fit_cli end-to-end: perturb a tiny grid scene, run a few train steps,
    verify the mu error shrinks and the final PNG is written (BASELINE
    config 4 surface — no reference analog, the reference is forward-only)."""
    from sgrt_tpu.fit_cli import main as fit_main

    out = tmp_path / "fitted.png"
    rc = fit_main(["-g", "2", "-w", "16", "--height", "16", "--tiles", "2",
                   "--steps", "6", "--views", "2", "--noise", "0.03",
                   "--lr", "5e-3", "--out", str(out)])
    assert rc in (0, None)
    outp = capsys.readouterr().out
    m = re.search(r"max \|mu error\|: ([\d.]+) -> ([\d.]+)", outp)
    assert m, outp
    assert float(m.group(2)) < float(m.group(1))
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_fit_cli_aniso_roundtrip(tmp_path, capsys):
    """fit_cli --aniso end-to-end: perturb means AND per-axis scales of a
    stretched grid scene, run a few aniso train steps, verify BOTH the mu
    and the scale error shrink (BASELINE config-4 'covariances' exercised
    from the CLI) and the final PNG is written."""
    from sgrt_tpu.fit_cli import main as fit_main

    out = tmp_path / "fitted_aniso.png"
    rc = fit_main(["-g", "2", "-w", "16", "--height", "16", "--tiles", "2",
                   "--steps", "40", "--views", "2", "--noise", "0.02",
                   "--lr", "1e-2", "--aniso", "1.5,0.7,1.0",
                   "--out", str(out)])
    assert rc in (0, None)
    outp = capsys.readouterr().out
    m = re.search(r"max \|mu error\|: ([\d.]+) -> ([\d.]+)", outp)
    assert m, outp
    assert float(m.group(2)) < float(m.group(1))
    s = re.search(r"max \|scale error\|: ([\d.]+) -> ([\d.]+)", outp)
    assert s, outp
    assert float(s.group(2)) < float(s.group(1))
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
