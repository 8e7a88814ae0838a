"""End-to-end CLI smoke tests: train -> checkpoint -> dump -> solve."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compile / oracle / e2e tier (see pytest.ini)


def test_train_cli_synthetic(tmp_path):
    from deepi2p_tpu.train.cli import main
    state = main([
        "--dataset", "synthetic", "--epochs", "1", "--synthetic-len", "4",
        "--batch-size", "2", "--workers", "1", "--log-every", "1",
        "--checkpoints-dir", str(tmp_path / "ck"),
        "--log-dir", str(tmp_path / "runs"),
    ])
    assert int(state.step) == 2
    assert os.path.exists(tmp_path / "runs" / "metrics.jsonl")
    # checkpoint written and resumable; --epochs is the TOTAL budget, so
    # resuming a finished 1-epoch run with --epochs 2 runs exactly one more
    state2 = main([
        "--dataset", "synthetic", "--epochs", "2", "--synthetic-len", "4",
        "--batch-size", "2", "--workers", "1", "--resume",
        "--checkpoints-dir", str(tmp_path / "ck"),
        "--log-dir", str(tmp_path / "runs"),
    ])
    assert int(state2.step) == 4
    # resuming again with the same total budget is a no-op
    state3 = main([
        "--dataset", "synthetic", "--epochs", "2", "--synthetic-len", "4",
        "--batch-size", "2", "--workers", "1", "--resume",
        "--checkpoints-dir", str(tmp_path / "ck"),
        "--log-dir", str(tmp_path / "runs"),
    ])
    assert int(state3.step) == 4
    # compact cross-session snapshot: exported alongside each save, and
    # warm-starting a FRESH checkpoints dir from it resumes the epoch
    # count / lr schedule (fresh Adam moments by design)
    npz = tmp_path / "ck" / "latest.npz"
    assert npz.exists()
    state4 = main([
        "--dataset", "synthetic", "--epochs", "3", "--synthetic-len", "4",
        "--batch-size", "2", "--workers", "1",
        "--warm-start", str(npz),
        "--checkpoints-dir", str(tmp_path / "ck2"),
        "--log-dir", str(tmp_path / "runs"),
    ])
    assert int(state4.step) == 6


def test_warm_start_partial_requires_warm_start():
    """--warm-start-partial without --warm-start is a user error, not a
    silent no-op (ADVICE r4)."""
    from deepi2p_tpu.train.cli import main
    with pytest.raises(SystemExit):
        main(["--dataset", "synthetic", "--epochs", "1",
              "--warm-start-partial"])


def test_train_cli_steps_per_dispatch(tmp_path):
    from deepi2p_tpu.train.cli import main
    state = main([
        "--dataset", "synthetic", "--epochs", "1", "--synthetic-len", "8",
        "--batch-size", "2", "--workers", "1", "--log-every", "2",
        "--steps-per-dispatch", "2",
        "--checkpoints-dir", str(tmp_path / "ck"),
        "--log-dir", str(tmp_path / "runs"),
    ])
    assert int(state.step) == 4  # 4 steps = 2 scan dispatches of K=2


def test_export_npz_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from deepi2p_tpu.train.checkpoint import export_npz, warm_start_npz
    from deepi2p_tpu.train.engine import TrainState
    import optax

    params = {"dense": {"w": jnp.arange(6.0).reshape(2, 3),
                        "b": jnp.zeros((3,))}}
    bn = {"bn": {"mean": jnp.ones((3,))}}
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.asarray(7, jnp.int32), params=params,
                       batch_stats=bn, opt_state=tx.init(params))
    path = str(tmp_path / "s.npz")
    export_npz(state, path)
    template = TrainState(step=jnp.zeros((), jnp.int32),
                          params=jax.tree.map(jnp.zeros_like, params),
                          batch_stats=jax.tree.map(jnp.zeros_like, bn),
                          opt_state=tx.init(params))
    back = warm_start_npz(template, path, tx)
    assert int(back.step) == 7
    assert float(jnp.abs(back.params["dense"]["w"]
                         - params["dense"]["w"]).max()) == 0.0
    assert float(back.batch_stats["bn"]["mean"].sum()) == 3.0


def test_eval_cli_dump_and_solve(tmp_path, capsys):
    from deepi2p_tpu.eval.cli import main
    out = str(tmp_path / "dump")
    main(["dump", "--dataset", "synthetic", "--out", out,
          "--batch-size", "2", "--max-batches", "2"])
    files = os.listdir(out)
    assert sum(f.endswith("_pc_label.npy") for f in files) == 4

    from deepi2p_tpu import config
    cfg = config.tiny()
    summ = main(["solve", "--data-dir", out, "--method", "frustum",
                 "--img-h", str(cfg.img_H), "--img-w", str(cfg.img_W),
                 "--n-inits", "4", "--max-iter", "8"])
    assert summ["num_pairs"] == 4
    assert np.isfinite(summ["rte_mean"])


@pytest.mark.parametrize("preset,enu", [("kitti", False), ("nuscenes", True)])
def test_e2e_chain_dataset_shapes(tmp_path, preset, enu):
    """Tiny-scale train->dump->solve at the kitti-shaped (y-rotation) and
    nuscenes-shaped (ENU cloud, z-rotation, ``--enu2cam`` at solve —
    ``evaluation/registration_lsq.py:237-248``) configs, so those label/eval
    code paths execute end-to-end in CI."""
    from deepi2p_tpu.train.cli import main as train_main
    from deepi2p_tpu.eval.cli import main as eval_main
    dims = ["--synthetic-preset", preset, "--points", "128", "--nodes", "8",
            "--img-h", "32", "--img-w", "64"]
    train_main(["--dataset", "synthetic", "--epochs", "1",
                "--synthetic-len", "4", "--batch-size", "2", "--workers", "1",
                "--checkpoints-dir", str(tmp_path / "ck"),
                "--log-dir", str(tmp_path / "runs")] + dims)
    out = str(tmp_path / "dump")
    eval_main(["dump", "--dataset", "synthetic", "--out", out,
               "--batch-size", "2", "--max-batches", "1",
               "--checkpoint", str(tmp_path / "ck")] + dims)
    assert any(f.endswith("_pc_label.npy") for f in os.listdir(out))
    solve = ["solve", "--data-dir", out, "--method", "frustum",
             "--img-h", "32", "--img-w", "64", "--n-inits", "2",
             "--max-iter", "4"]
    if enu:
        solve.append("--enu2cam")
    summ = eval_main(solve)
    assert summ["num_pairs"] == 2 and np.isfinite(summ["rte_mean"])


def test_eval_cli_dump_inside_threshold(tmp_path):
    """p_inside > t decision: t->0 predicts (nearly) everything inside,
    t=0.5 equals the argmax dump."""
    from deepi2p_tpu.eval.cli import main
    out_argmax = str(tmp_path / "argmax")
    out_t5 = str(tmp_path / "t5")
    out_t0 = str(tmp_path / "t0")
    base = ["dump", "--dataset", "synthetic", "--batch-size", "2",
            "--max-batches", "1"]
    main(base + ["--out", out_argmax])
    main(base + ["--out", out_t5, "--inside-threshold", "0.5"])
    main(base + ["--out", out_t0, "--inside-threshold", "0.001"])
    a = np.load(os.path.join(out_argmax, "000000_00_pc_label.npy"))
    t5 = np.load(os.path.join(out_t5, "000000_00_pc_label.npy"))
    t0 = np.load(os.path.join(out_t0, "000000_00_pc_label.npy"))
    np.testing.assert_array_equal(a[3], t5[3])   # argmax == p>0.5 (C=2)
    assert t0[3].mean() > a[3].mean() or t0[3].mean() == 1.0


def test_eval_cli_dump_classify_n(tmp_path):
    """--classify-n: the dump keeps the full cloud/labels geometry while
    the network runs at the (smaller) trained point count on shuffled
    subsets (eval.dump.SubsampleEnsemble).  Checks the npy contract shape,
    prob coverage, and that the coarse decision equals p > 0.5."""
    from deepi2p_tpu.eval.cli import main
    out = str(tmp_path / "ens")
    main(["dump", "--dataset", "synthetic", "--out", out,
          "--batch-size", "2", "--max-batches", "1",
          "--points", "96", "--nodes", "8", "--img-h", "32", "--img-w", "64",
          "--classify-n", "64", "--classify-repeats", "2", "--save-probs"])
    d = np.load(os.path.join(out, "000000_00_pc_label.npy"))
    p = np.load(os.path.join(out, "000000_00_p.npy"))
    assert d.shape == (7, 96) and p.shape == (96,)
    assert np.all((p >= 0.0) & (p <= 1.0))
    np.testing.assert_array_equal(d[3], (p > 0.5).astype(np.float32))


def test_eval_cli_solve_inside_threshold_and_outside_weight(tmp_path):
    """Solve-time relabelling from saved probs: t=0.5 matches the argmax
    dump's solve bit-for-bit; a probless dump raises; outside_weight
    routes through the weighted LM and still returns finite poses."""
    from deepi2p_tpu.eval.cli import main
    from deepi2p_tpu import config
    cfg = config.tiny()
    out = str(tmp_path / "dump")
    main(["dump", "--dataset", "synthetic", "--out", out,
          "--batch-size", "2", "--max-batches", "2", "--save-probs"])
    base = ["solve", "--data-dir", out, "--method", "frustum",
            "--img-h", str(cfg.img_H), "--img-w", str(cfg.img_W),
            "--n-inits", "4", "--max-iter", "8"]
    s_argmax = main(base)
    s_t5 = main(base + ["--inside-threshold", "0.5"])
    np.testing.assert_allclose(s_t5["rte_mean"], s_argmax["rte_mean"],
                               rtol=1e-6)
    s_w = main(base + ["--inside-threshold", "0.2",
                       "--outside-weight", "0.5"])
    assert np.isfinite(s_w["rte_mean"]) and s_w["num_pairs"] == 4

    out2 = str(tmp_path / "noprobs")
    main(["dump", "--dataset", "synthetic", "--out", out2,
          "--batch-size", "2", "--max-batches", "1"])
    with pytest.raises(ValueError, match="save-probs"):
        main(["solve", "--data-dir", out2, "--method", "frustum",
              "--img-h", str(cfg.img_H), "--img-w", str(cfg.img_W),
              "--n-inits", "2", "--max-iter", "4",
              "--inside-threshold", "0.5"])
