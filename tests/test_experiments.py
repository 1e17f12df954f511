"""End-to-end smoke tests: every experiment driver trains a few steps and
evaluates on CPU with tiny configs (the reference has no such tests; SURVEY
§4 calls for CPU-runnable end-to-end smoke)."""
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_so3_toy_train_and_test(tmp_path, capsys):
    from diffusion_extensions_tpu.experiments import so3_toy

    ckpt = os.path.join(str(tmp_path), "ck")
    so3_toy.main(
        ["--steps", "12", "--batch", "16", "--timesteps", "20",
         "--ckpt", ckpt, "--ckpt-every", "12", "--print-every", "6"]
    )
    so3_toy.main(
        ["--test", "--eval-batch", "32", "--timesteps", "20", "--ckpt", ckpt]
    )
    out = capsys.readouterr().out
    assert "percentiles" in out


@pytest.mark.slow
def test_lock_both_params(tmp_path, capsys):
    from diffusion_extensions_tpu.experiments import lock

    for param in ("so3", "euler"):
        ckpt = os.path.join(str(tmp_path), f"ck_{param}")
        lock.main(
            ["--param", param, "--steps", "6", "--batch", "8",
             "--timesteps", "10", "--ckpt", ckpt, "--ckpt-every", "6"]
        )
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            lock.main(
                ["--param", param, "--test", "--eval-batch", "16",
                 "--timesteps", "10", "--ckpt", ckpt]
            )
        finally:
            os.chdir(cwd)
    out = capsys.readouterr().out
    assert "axis.y" in out


@pytest.mark.slow
def test_bingham_train(tmp_path):
    from diffusion_extensions_tpu.experiments import bingham

    ckpt = os.path.join(str(tmp_path), "ck")
    # run inside tmp_path: the driver's online curve eval writes
    # results/bingham_mmd_curve_*.json relative to the cwd, and running
    # from the repo root would clobber the real artifacts
    cwd = os.getcwd()
    os.chdir(str(tmp_path))
    try:
        bingham.main(
            ["sur", "--steps", "6", "--batch", "16", "--timesteps", "10",
             "--ckpt", ckpt, "--ckpt-every", "6"]
        )
    finally:
        os.chdir(cwd)
    assert os.path.exists(
        os.path.join(str(tmp_path), "results", "bingham_mmd_curve_sur.json")
    )


@pytest.mark.slow
def test_aircraft_train_synthetic(tmp_path, capsys):
    from diffusion_extensions_tpu.experiments import aircraft

    ckpt = os.path.join(str(tmp_path), "ck")
    aircraft.main(
        ["--so3", "--steps", "4", "--batch", "8", "--samples", "32",
         "--dim", "64", "--heads", "2", "--layers", "1",
         "--timesteps", "10", "--ckpt", ckpt, "--ckpt-every", "4",
         "--print-every", "2", "--data-root", "/nonexistent"]
    )
    out = capsys.readouterr().out
    assert "synthetic_planes" in out


def test_aircraft_euler_variant(tmp_path):
    from diffusion_extensions_tpu.experiments import aircraft

    ckpt = os.path.join(str(tmp_path), "ck_eul")
    aircraft.main(
        ["--steps", "3", "--batch", "8", "--samples", "32",
         "--dim", "64", "--heads", "2", "--layers", "1",
         "--timesteps", "10", "--ckpt", ckpt, "--ckpt-every", "3",
         "--data-root", "/nonexistent"]
    )


def test_jigsaw_train(tmp_path):
    from diffusion_extensions_tpu.experiments import jigsaw

    ckpt = os.path.join(str(tmp_path), "ck")
    jigsaw.main(
        ["--steps", "2", "--batch", "4", "--size", "128",
         "--timesteps", "10", "--ckpt", ckpt, "--ckpt-every", "2"]
    )


def test_protein_both_variants(tmp_path, capsys):
    from diffusion_extensions_tpu.experiments import protein

    for flag in (["--se3"], []):
        ckpt = os.path.join(str(tmp_path), f"ck_{'se3' if flag else 'eul'}")
        protein.main(
            flag + ["--steps", "3", "--batch", "2", "--dim", "32",
                    "--heads", "2", "--t_depth", "1", "--c_depth", "3",
                    "--timesteps", "10", "--ckpt", ckpt,
                    "--data-root", "/nonexistent"]
        )
    out = capsys.readouterr().out
    assert "synthetic protein pairs" in out


def test_protein_epoch_accum(tmp_path):
    from diffusion_extensions_tpu.experiments import protein

    ckpt = os.path.join(str(tmp_path), "ck_accum")
    protein.main(
        ["--se3", "--epoch-accum", "--steps", "3", "--batch", "2",
         "--dim", "32", "--heads", "2", "--t_depth", "1", "--c_depth", "3",
         "--timesteps", "10", "--ckpt", ckpt, "--data-root", "/nonexistent"]
    )


def test_bench_importable():
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main")


def test_bench_regression_guard(tmp_path):
    """bench._regression_check: headline flag at >3% drop, per-row flags at
    >10% (throughput drop or latency rise), driver-wrapped BENCH_r*.json
    unwrapping — the guard added for the round-4 bingham drift
    (VERDICT r4 item 3) must not silently stop comparing."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    prev_inner = {
        "value": 200.0,
        "rows": {
            "protein_train_b16": {"steps_per_sec": 50.0},
            "mmd_eval": {"seconds": 0.040},
            "sampler_1000": {"seconds": 0.150},
        },
    }
    # the driver wraps the JSON line under "tail" with log noise around it
    wrapped = {"n": 5, "cmd": "python bench.py",
               "tail": "some log noise\n" + json.dumps(prev_inner) + "\n"}
    (tmp_path / "BENCH_r07.json").write_text(json.dumps(wrapped))
    mod.__file__ = str(tmp_path / "bench.py")  # redirect the glob

    result = {
        "value": 201.0,  # +0.5%: fine
        "rows": {
            "protein_train_b16": {"steps_per_sec": 40.0},  # -20%: flag
            "mmd_eval": {"seconds": 0.050},                # +25% latency: flag
            "sampler_1000": {"seconds": 0.151},            # +0.7%: fine
        },
    }
    merged = mod._regression_check(result)
    assert merged["prev_round"] == 7
    assert merged["regression"] is False
    assert merged["row_regressions"] == {
        "protein_train_b16.steps_per_sec": -20.0,
        "mmd_eval.seconds": 25.0,
    }

    # headline drop beyond the 3% threshold flags
    merged = mod._regression_check({"value": 190.0, "rows": {}})
    assert merged["regression"] is True


def test_graft_entry_importable():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    import jax

    out = jax.jit(fn)(*args)
    assert out.shape == (8, 3)


def test_sweep_metric_collection_and_ranking(tmp_path):
    """tools/sweep.py metric plumbing: JSONL aggregation + ranking
    (the wandb-sweep 'test loss' optimisation semantics, offline)."""
    import importlib.util
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "sweep", str(root / "tools" / "sweep.py"))
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)

    log = tmp_path / "m.jsonl"
    with open(log, "w") as f:
        for v in (5.0, 3.0, 4.0):
            f.write(json.dumps({"loss": v}) + "\n")
        f.write("not json\n")
        f.write(json.dumps({"other": 1.0}) + "\n")
    assert sweep.collect_metric(str(log), "loss", "last") == 4.0
    assert sweep.collect_metric(str(log), "loss", "min") == 3.0
    assert sweep.collect_metric(str(log), "loss", "mean10") == 4.0
    assert sweep.collect_metric(str(log), "missing") is None
    assert sweep.collect_metric(str(tmp_path / "absent.jsonl"), "loss") is None

    results = [
        {"tag": "a", "value": 2.0},
        {"tag": "b", "value": 1.0},
        {"tag": "c", "value": None},
        {"tag": "d", "value": 3.0},
    ]
    ranked = sweep.rank_results([dict(r) for r in results])
    assert [r["tag"] for r in ranked] == ["b", "a", "d", "c"]
    assert [r["rank"] for r in ranked] == [1, 2, 3, 4]
    ranked_max = sweep.rank_results([dict(r) for r in results], maximize=True)
    assert [r["tag"] for r in ranked_max] == ["d", "a", "b", "c"]
