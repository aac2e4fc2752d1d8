"""CLI driver smoke tests (subprocess-free: call main() directly)."""
import numpy as np

from tinman_sandbox_tpu.cli import main


def test_cli_analytic_golden(capsys, tmp_path):
    rc = main(["--num-elems", "3", "--num-exec", "3", "--kernel", "xla",
               "--golden-check",
               "--timing-file", str(tmp_path / "Timing.dat"),
               "--checkpoint", str(tmp_path / "ck.npz")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "golden diffs" in out
    # golden diffs ~1e-7 for the analytic f64 run
    t_diff = float(out.split("golden diffs: T")[1].split()[0])
    assert t_diff < 1e-6
    assert (tmp_path / "Timing.dat").exists()
    assert (tmp_path / "ck.npz").exists()


def test_cli_restore_and_dump(capsys, tmp_path):
    ck = str(tmp_path / "ck.npz")
    assert main(["--num-elems", "2", "--nlev", "6", "--num-exec", "2",
                 "--kernel", "xla", "--leapfrog", "--checkpoint", ck]) == 0
    import os

    os.chdir(tmp_path)  # dump into tmp
    assert main(["--num-elems", "2", "--nlev", "6", "--num-exec", "1",
                 "--kernel", "xla", "--leapfrog", "--restore", ck,
                 "--dump-res", "yes"]) == 0
    out = capsys.readouterr().out
    assert "restored step 2" in out
    assert (tmp_path / "elem_state_t.txt").exists()


def test_cli_dss_cubed_sphere(capsys):
    rc = main(["--ne", "2", "--nlev", "5", "--num-exec", "2", "--init",
               "random", "--dss", "--leapfrog"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "24 elements" in out


def test_cli_rk_hypervis_diag(capsys):
    rc = main(["--ne", "2", "--nlev", "4", "--num-exec", "2", "--init",
               "random", "--rk", "--leapfrog", "--diag",
               "--hypervis-nu", "1e12", "--dt", "10"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "initial diagnostics" in out and "final diagnostics" in out


def test_cli_pallas_on_cpu_falls_back_to_interpret(capsys):
    """--kernel pallas off-TPU must run (interpret mode), not crash."""
    rc = main(["--num-elems", "8", "--nlev", "4", "--num-exec", "1",
               "--kernel", "pallas", "--dtype", "float32"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "interpret mode" in out


def test_cli_orbax_checkpoint_roundtrip(capsys, tmp_path):
    ck = str(tmp_path / "ck_orbax_dir")
    assert main(["--num-elems", "2", "--nlev", "6", "--num-exec", "2",
                 "--kernel", "xla", "--leapfrog", "--checkpoint", ck]) == 0
    assert main(["--num-elems", "2", "--nlev", "6", "--num-exec", "1",
                 "--kernel", "xla", "--leapfrog", "--restore", ck]) == 0
    out = capsys.readouterr().out
    assert "restored step 2" in out


def test_cli_dss_pallas_structured(capsys):
    """--dss --kernel pallas routes through the structured-DSS fused step
    (interpret mode off-TPU)."""
    rc = main(["--ne", "2", "--nlev", "4", "--num-exec", "2", "--init",
               "random", "--dss", "--kernel", "pallas",
               "--dtype", "float32", "--leapfrog"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pallas+structured-dss" in out


def test_cli_prim_packed(capsys):
    """--prim on the packed pallas path (interpret off-TPU) runs the full
    cadence and reports finite norms."""
    rc = main(["--ne", "2", "--nlev", "4", "--num-exec", "2", "--init",
               "random", "--prim", "--hypervis-nu", "1e-4", "--dt", "0.02",
               "--dtype", "float32", "--kernel", "pallas"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "prim-packed(ssprk3+hypervis+tracers)" in out
    assert "Final" in out


def test_cli_prim_field(capsys):
    """--prim on the field-layout path (timeloop.prim)."""
    rc = main(["--ne", "2", "--nlev", "4", "--num-exec", "2", "--init",
               "random", "--prim", "--dt", "0.02", "--kernel", "xla"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "prim(ssprk3+hypervis+tracers)" in out


def test_packed_cadence_example():
    """The packed-cadence example (full fused path + limiter + remap +
    packed diagnostics) conserves mass and stays finite."""
    import os
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), "examples", "packed_cadence.py"),
         "--ne", "2",
         "--nlev", "4", "--steps", "4", "--cpu", "--qsplit", "1"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "finite=True" in r.stdout
