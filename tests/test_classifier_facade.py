"""MMClassifier facade: the reference engine API on the jitted engine."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compile / e2e tier (see pytest.ini)
import jax.numpy as jnp

from deepi2p_tpu import config
from deepi2p_tpu.data import synthetic_batch
from deepi2p_tpu.train.classifier import MMClassifier


def test_facade_train_eval_infer(tmp_path):
    cfg = config.tiny()
    clf = MMClassifier(cfg, steps_per_epoch=10, log_dir=str(tmp_path / "log"))
    batch = synthetic_batch(cfg, seed=0)
    clf.set_input(batch)

    m1 = clf.optimize()
    assert np.isfinite(m1["loss"]) and clf.global_step == 1
    m2 = clf.test_model()
    assert "coarse_accuracy" in m2
    coarse, fine = clf.inference_pass()
    assert coarse.shape == (cfg.batch_size, cfg.input_pt_num)

    train_err, test_err = clf.get_current_errors()
    assert train_err["loss"] == m1["loss"]
    acc_tr, acc_te = clf.get_current_accuracy()
    assert set(acc_tr) == {"coarse_accuracy", "fine_accuracy"}

    lr = clf.update_learning_rate(0.5)
    assert 0 < lr <= cfg.lr * 1.001

    ckdir = str(tmp_path / "ck")
    clf.save_network(ckdir)
    clf.optimize()
    clf.load_model(ckdir)
    assert clf.global_step == 1  # restored

    canvas = clf.write_classification_visualization()
    assert canvas is not None and canvas.ndim == 3
