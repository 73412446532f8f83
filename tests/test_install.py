"""``pip install .`` is a supported path (round-5 review item 7).

Builds the wheel, installs it into a fresh venv (``--system-site-packages``
for the baked-in jax/optax/orbax; the wheel itself installs with
``--no-index --no-deps`` — this box has zero egress), and drives the
installed console scripts from a cwd OUTSIDE the repo root:

- ``mgnns-train --help`` — entry points resolve;
- a tiny text-only training epoch — the package works without the repo
  checkout (the native C++ preproc falls back to numpy by design when
  ``native/`` is absent, ``mgnns_tpu/native.py:38-47``).
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/data"


def _run(cmd, cwd, env=None):
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=1200)
    assert r.returncode == 0, (
        f"{' '.join(cmd)} failed ({r.returncode}):\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
    return r


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF), reason="reference data unavailable")
def test_pip_install_wheel_and_run_outside_repo(tmp_path):
    wheels = tmp_path / "wheels"
    _run([sys.executable, "-m", "pip", "wheel", "--no-deps",
          "--no-build-isolation", "-w", str(wheels), ROOT], cwd=str(tmp_path))
    built = list(wheels.glob("mgnns_tpu-*.whl")) + list(wheels.glob("mgnns-tpu-*.whl"))
    assert built, f"no wheel built in {wheels}: {list(wheels.iterdir())}"

    venv = tmp_path / "venv"
    _run([sys.executable, "-m", "venv", "--system-site-packages", str(venv)],
         cwd=str(tmp_path))
    vbin = venv / "bin"
    _run([str(vbin / "pip"), "install", "--no-index", "--no-deps",
          str(built[0])], cwd=str(tmp_path))

    # run from OUTSIDE the repo root, with no repo on sys.path.  The host
    # deps (jax/optax/orbax) live in THIS interpreter's env (itself a venv,
    # so --system-site-packages does not see them) — expose its site-packages
    # via PYTHONPATH; the installed mgnns_tpu wheel is not shadowed because
    # the host env does not contain mgnns_tpu.
    import sysconfig

    workdir = tmp_path / "work"
    workdir.mkdir()
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = sysconfig.get_paths()["purelib"]
    env["JAX_PLATFORMS"] = "cpu"

    out = _run([str(vbin / "mgnns-train"), "--help"], cwd=str(workdir), env=env)
    assert "--use_pallas" in out.stdout

    # the installed package must not be shadowed by the checkout
    probe = _run([str(vbin / "python"), "-c",
                  "import mgnns_tpu, os; print(os.path.dirname(mgnns_tpu.__file__))"],
                 cwd=str(workdir), env=env)
    assert str(venv) in probe.stdout, probe.stdout

    res = _run([
        str(vbin / "mgnns-train"),
        "--data_root_path", REF, "--pmi_phase", "val",
        "--train_phase", "val", "--val_phase", "val", "--test_phase", "test",
        "--text_only", "--epochs", "1", "-b", "32", "--limit_samples", "64",
        "--lr", "1e-3", "-e",
        "--save_model_path", str(workdir / "ckpt"),
        "--save_experiment_result_path", str(workdir / "exp"),
        "--save_pred_result_path", str(workdir / "pred"),
    ], cwd=str(workdir), env=env)
    tag = "text_min_count_5_ngram_4_window_6_bts_32.txt"
    assert (workdir / "exp" / "mgnns_tpu" / tag).exists(), res.stdout[-2000:]
