"""CLI tests: flag surface, export matrix, sequence naming, completion."""

import os

import numpy as np
import pytest

from strange_attractor_tpu.cli import _validate, build_parser, config_from_args, main
from strange_attractor_tpu.config import BinStrategy, RenderKind

FAST = [
    "-i", "4000", "-w", "32", "-h", "18", "--lanes", "32", "--chunk-steps", "16",
    "--seed", "1", "-q",
]


def test_defaults_match_reference():
    parser = build_parser()
    args = parser.parse_args([])
    _validate(args, parser)
    assert args.iterations == 10_000_000
    assert args.width == 1920 and args.height == 1080
    assert args.scale is None and args.preset == "poisson-saturne"  # None = keep preset scale
    assert args.jobs_per_thread == 12 and args.angle == 0.0
    assert args.brightness_offset == -0.15
    assert args.name == "attractor"
    assert not args.transparent and not args.eight_bit and not args.depth


def test_jobs_per_thread_conflicts_with_single_device():
    """-j and --single-device are mutually exclusive like the reference's
    clap conflicts_with (main.rs:297-306); each alone is fine."""
    with pytest.raises(SystemExit):
        main(FAST + ["-j", "4", "--single-device"])
    with pytest.raises(SystemExit):
        main(FAST + ["-j", "0"])  # reference parses NonZeroUsize
    parser = build_parser()
    args = parser.parse_args(["-j", "4"])
    _validate(args, parser)
    assert args.jobs_per_thread == 4
    args = parser.parse_args(["--single-device"])
    _validate(args, parser)
    assert args.jobs_per_thread == 12


def test_coordinator_requires_process_topology():
    """--coordinator without --num-processes/--process-id is a clean argparse
    error, not a raw jax.distributed backend failure."""
    for argv in (
        ["--coordinator", "127.0.0.1:1234"],
        ["--coordinator", "127.0.0.1:1234", "--num-processes", "2"],
        ["--coordinator", "127.0.0.1:1234", "--process-id", "0"],
    ):
        with pytest.raises(SystemExit):
            main(FAST + argv)


def test_config_from_args():
    args = build_parser().parse_args(
        ["-i", "5000", "-b", "-0.25", "-s", "1.7", "--depth", "-t", "-a", "90"]
    )
    cfg = config_from_args(args)
    assert cfg.iterations == 5000
    assert cfg.colors.brightness.offset == -0.25
    assert cfg.view.scale == 1.7
    assert cfg.render == RenderKind.DEPTH
    assert cfg.transparent
    np.testing.assert_allclose(cfg.angle, np.pi / 2)


def test_sequence_validation():
    with pytest.raises(SystemExit):
        main(FAST + ["sequence", "-s", "10", "-e", "5"])
    with pytest.raises(SystemExit):
        main(FAST + ["sequence", "-d", "-1"])


def test_format_requires_8bit():
    with pytest.raises(SystemExit):
        main(FAST + ["--pam"])
    with pytest.raises(SystemExit):
        main(FAST + ["--bmp"])


def test_render_png(tmp_path):
    out = tmp_path / "img"
    assert main(FAST + ["-o", str(out)]) == 0
    assert (tmp_path / "img.png").exists()


def test_render_bmp_8bit(tmp_path):
    out = tmp_path / "img"
    assert main(FAST + ["-o", str(out), "--bmp", "-8"]) == 0
    assert (tmp_path / "img.bmp").exists()


def test_render_pam_8bit_transparent(tmp_path):
    out = tmp_path / "img"
    assert main(FAST + ["-o", str(out), "--pam", "-8", "-t"]) == 0
    data = (tmp_path / "img.pam").read_bytes()
    assert data.startswith(b"P7") and b"DEPTH 4" in data


def test_render_depth_16bit(tmp_path):
    out = tmp_path / "img"
    assert main(FAST + ["-o", str(out), "--depth"]) == 0
    assert (tmp_path / "img.png").exists()


def test_sequence_naming(tmp_path):
    out = tmp_path / "anim"
    assert main(FAST + ["-o", str(out), "sequence", "-s", "0", "-e", "3", "-d", "1"]) == 0
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["anim0.png", "anim1.png", "anim2.png"]


def test_sequence_depth_8bit(tmp_path):
    """A depth sequence through the CLI (wire-reduced delivery path) writes
    valid 8-bit frames; the -8 deliverable conversion applies per frame."""
    out = tmp_path / "anim"
    assert main(FAST + ["-o", str(out), "--depth", "-8",
                        "sequence", "-s", "0", "-e", "2", "-d", "1",
                        "--frames-per-batch", "2"]) == 0
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["anim0.png", "anim1.png"]
    data = (tmp_path / "anim0.png").read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and data[24] == 8  # bit depth 8


def test_single_frame_plain_name(tmp_path):
    out = tmp_path / "one"
    assert main(FAST + ["-o", str(out), "-a", "45"]) == 0
    assert (tmp_path / "one.png").exists()


def test_state_checkpoint_roundtrip(tmp_path):
    out = tmp_path / "img"
    ckpt = tmp_path / "state.npz"
    assert main(FAST + ["-o", str(out), "--save-state", str(ckpt)]) == 0
    assert ckpt.exists()
    assert main(FAST + ["-o", str(out), "--load-state", str(ckpt)]) == 0


def test_completion_script(capsys):
    assert main(["completion", "--shell", "bash"]) == 0
    out = capsys.readouterr().out
    assert "--iterations" in out and "complete -F" in out
    assert main(["completion", "--shell", "fish"]) == 0
    assert "complete -c" in capsys.readouterr().out


def test_bin_strategy_flag(tmp_path):
    out = tmp_path / "img"
    assert main(FAST + ["-o", str(out), "--bin-strategy", "exact"]) == 0
    assert main(FAST + ["-o", str(out), "--bin-strategy", "packed"]) == 0


def test_sequence_batched_flag(tmp_path):
    out = tmp_path / "anim"
    assert main(FAST + ["-o", str(out), "sequence", "-s", "0", "-e", "3", "-d", "1",
                        "--frames-per-batch", "2"]) == 0
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["anim0.png", "anim1.png", "anim2.png"]


def test_sequence_shared_orbit_flag(tmp_path):
    out = tmp_path / "anim"
    assert main(FAST + ["-o", str(out), "sequence", "-s", "0", "-e", "3", "-d", "1",
                        "--frames-per-batch", "2", "--orbit", "shared"]) == 0
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["anim0.png", "anim1.png", "anim2.png"]
    # shared orbits render whole batches at once; the serial frame loop
    # (frames-per-batch 0) has no shared-orbit analog
    with pytest.raises(SystemExit):
        main(FAST + ["sequence", "--orbit", "shared"])


def test_preset_scale_preserved_unless_overridden():
    from strange_attractor_tpu.models import presets as _presets

    args = build_parser().parse_args(["-p", "solar-sail"])
    cfg = config_from_args(args)
    assert cfg.view.scale == 1.7  # preset value survives (reference stomped it)
    args2 = build_parser().parse_args(["-p", "solar-sail", "-s", "2.5"])
    assert config_from_args(args2).view.scale == 2.5
    args3 = build_parser().parse_args(["-p", "lorenz"])
    assert config_from_args(args3).view.scale == 0.02


def test_custom_coefficients():
    """Custom polynomial coefficients from the CLI (not possible in the
    reference without writing Rust)."""
    coeffs = ["--coeffs-x"] + [str(v) for v in
              (0.021, 1.182, -1.183, 0.128, -1.12, -0.641, -1.152, -0.834, -0.97, 0.722)]
    args = build_parser().parse_args(coeffs + ["--camera", "0.1", "0.2", "0.3",
                                               "--rotation-axis", "0", "0", "1", "0.5"])
    cfg = config_from_args(args)
    assert cfg.attractor.x[1] == 1.182
    # unspecified rows keep the preset's values (poisson-saturne default)
    assert cfg.attractor.y[0] == 0.243038
    assert cfg.view.center_camera == (0.1, 0.2, 0.3)
    assert cfg.view.rotation.axis == (0.0, 0.0, 1.0)
    assert cfg.view.rotation.rotation == 0.5


def test_custom_coefficients_render(tmp_path):
    out = tmp_path / "custom"
    coeffs = (["--coeffs-x"] + ["0.021", "1.182", "-1.183", "0.128", "-1.12",
                                "-0.641", "-1.152", "-0.834", "-0.97", "0.722"])
    assert main(FAST + coeffs + ["-o", str(out)]) == 0
    assert (tmp_path / "custom.png").exists()


def test_verbose_render_announces_start(tmp_path, capsys):
    """Non-silent renders announce the lane batch starting, the SPMD analog
    of the reference's per-thread 'Rendering started on thread.'
    (src/lib.rs:953-954); -q must suppress it."""
    out = tmp_path / "loud"
    args = ["-i", "102400", "-w", "32", "-h", "18", "--lanes", "32",
            "--chunk-steps", "16", "--seed", "1", "--single-device",
            "-o", str(out)]
    assert main(args) == 0
    loud = capsys.readouterr().out
    assert "Rendering started on device (32 lanes)." in loud
    assert "Iteration complete" in loud
    assert main(args + ["-q"]) == 0
    assert "Rendering started" not in capsys.readouterr().out


def test_doctor(capsys):
    assert main(["doctor"]) == 0
    out = capsys.readouterr().out
    assert "oracle agreement" in out and "doctor: OK" in out


def test_preview_every_writes_separate_file(tmp_path):
    """Previews must not clobber the final output (regression:
    Path.with_suffix swallowed the '.preview' marker)."""
    out = tmp_path / "img"
    rc = main(["-i", "102400", "-w", "32", "-h", "18", "--lanes", "32",
               "--chunk-steps", "16", "--seed", "1", "-q", "--single-device",
               "--preview-every", "0.0001", "-o", str(out)])
    assert rc == 0
    assert (tmp_path / "img.png").exists()
    assert (tmp_path / "img-preview.png").exists()


def test_completion_value_choices_and_subcommands():
    """Generated scripts complete option values (preset names, strategies)
    and per-subcommand flags — not just a flat word list."""
    from strange_attractor_tpu.cli import build_parser
    from strange_attractor_tpu.utils.completion import completion_script

    parser = build_parser()
    bash = completion_script("bash", parser)
    assert "poisson-saturne solar-sail" in bash  # -p value choices
    assert "auto exact packed depth" in bash  # --bin-strategy choices
    assert "compgen -f" in bash  # file completion for path-valued flags
    assert "--frames-per-batch" in bash  # sequence-only flag present
    zsh = completion_script("zsh", parser)
    assert "_files" in zsh and "(bash zsh fish)" in zsh
    fish = completion_script("fish", parser)
    assert "__fish_seen_subcommand_from" in fish


def test_completion_install(tmp_path):
    from strange_attractor_tpu.cli import build_parser
    from strange_attractor_tpu.utils.completion import install_completion

    parser = build_parser()
    for shell in ("bash", "zsh", "fish"):
        path = install_completion(shell, parser, home=tmp_path)
        assert path.exists() and tmp_path in path.parents
        assert parser.prog in path.read_text()


def test_custom_palette_flag(tmp_path):
    """--palette drives the interpolation table; bad input errors cleanly."""
    from strange_attractor_tpu.cli import build_parser, _validate, config_from_args

    parser = build_parser()
    args = parser.parse_args(
        ["--palette", "1,0,0;0,1,0;0,0,1", "-i", "1000", "--seed", "1"]
    )
    _validate(args, parser)
    cfg = config_from_args(args)
    assert cfg.colors.palette.count == 3
    np.testing.assert_allclose(cfg.colors.palette.stops[0], [1.0, 0.0, 0.0])

    # invalid stop arity -> argparse error, not a traceback
    import pytest
    bad = parser.parse_args(["--palette", "1,0;0,1"])
    with pytest.raises(SystemExit):
        _validate(bad, parser)


def test_custom_palette_end_to_end(tmp_path):
    """A red-only palette yields a red-dominated render."""
    from strange_attractor_tpu.cli import main

    out = tmp_path / "red"
    rc = main([
        "--palette", "1,0,0;1,0,0", "-i", "20000", "-w", "48", "-h", "27",
        "--lanes", "32", "--chunk-steps", "16", "--seed", "2", "-8", "-q",
        "-o", str(out),
    ])
    assert rc == 0
    from PIL import Image
    arr = np.asarray(Image.open(out.with_suffix(".png")))
    lit = arr[..., :3].sum(axis=-1) > 0
    assert lit.any()
    assert (arr[..., 1][lit] == 0).all() and (arr[..., 2][lit] == 0).all()
    assert arr[..., 0][lit].max() > 0


def test_depth_strategy_mismatch_rejected():
    """A depth-only accumulation cannot serve a Gas render (and vice versa):
    reject at parse time instead of after the full render budget."""
    from strange_attractor_tpu.cli import build_parser, _validate

    p = build_parser()
    for argv in (
        ["--bin-strategy", "depth-kernel"],          # gas render, z-only planes
        ["--bin-strategy", "depth"],
        ["--depth", "--bin-strategy", "kernel"],     # depth render, no z plane
        ["--depth", "--bin-strategy", "packed"],
    ):
        with pytest.raises(SystemExit):
            _validate(p.parse_args(argv), p)
    # the legitimate combinations still pass
    for argv in (
        ["--depth", "--bin-strategy", "depth-kernel"],
        ["--depth", "--bin-strategy", "exact-kernel"],
        ["--bin-strategy", "exact16-kernel"],
        ["--depth"],
    ):
        _validate(p.parse_args(argv), p)


def test_palette_range_validated():
    from strange_attractor_tpu.cli import build_parser, _validate

    p = build_parser()
    with pytest.raises(SystemExit):
        _validate(p.parse_args(["--palette", "1,1,1;-0.5,0,0"]), p)
    with pytest.raises(SystemExit):
        _validate(p.parse_args(["--palette", "1,1,1.5"]), p)
    _validate(p.parse_args(["--palette", "1,1,1;.5,0,0"]), p)


def test_load_state_on_mesh_no_warning(tmp_path, capsys):
    """--load-state resumes ON the multi-device mesh (round-4 verdict
    item 5): no single-device fallback warning, and the resumed render
    keeps accumulating (count sum doubles for the same budget)."""
    import numpy as np

    from strange_attractor_tpu.runtime import load_state

    ckpt = tmp_path / "state.npz"
    out = tmp_path / "img"
    assert main(FAST + ["-o", str(out), "--save-state", str(ckpt)]) == 0
    first = int(np.asarray(load_state(str(ckpt)).count).sum())
    capsys.readouterr()
    assert main(FAST + ["-o", str(out), "--load-state", str(ckpt),
                        "--save-state", str(ckpt)]) == 0
    assert "warning" not in capsys.readouterr().err
    assert int(np.asarray(load_state(str(ckpt)).count).sum()) == 2 * first


def test_preview_every_works_on_mesh(tmp_path, capsys):
    """--preview-every on a multi-device render (round-4 verdict item 6):
    grouped mesh dispatch produces the preview file instead of a warning."""
    out = tmp_path / "img"
    rc = main(["-i", "102400", "-w", "32", "-h", "18", "--lanes", "64",
               "--chunk-steps", "16", "--seed", "1", "-q",
               "--preview-every", "0.0001", "-o", str(out)])
    assert rc == 0
    assert "warning" not in capsys.readouterr().err
    assert (tmp_path / "img.png").exists()
    assert (tmp_path / "img-preview.png").exists()
