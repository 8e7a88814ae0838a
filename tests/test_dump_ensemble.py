"""SubsampleEnsemble mechanics (eval/dump.py).

The wrapper classifies an N-point cloud through a model trained at
``sub_n`` points by splitting it into shuffled subsets and averaging the
per-point inside-probabilities.  These tests pin the index bookkeeping
with a stub engine whose outputs are pure per-point functions — the
ensemble must then reproduce them EXACTLY for every point, for any
(N, sub_n) relation (N a multiple of sub_n, ragged pad, N == sub_n, and
the degenerate N < sub_n).  The real-model integration runs in
``tests/test_cli.py::test_eval_cli_dump_classify_n`` (slow tier).
"""
import numpy as np
import pytest

from deepi2p_tpu.eval.dump import SubsampleEnsemble


class _StubCfg:
    def __init__(self, sub_n):
        self.input_pt_num = sub_n
        self.node_a_num = 4
        self.node_b_num = 4


class _StubEngine:
    """Per-point deterministic outputs: p = sigmoid(x), fine = round(10z).

    Also records every sub-batch to let tests assert shapes/coverage.
    """

    def __init__(self, sub_n):
        self.cfg = _StubCfg(sub_n)
        self.calls = []

    def infer_probs(self, state, batch):
        pc = np.asarray(batch["pc"])
        self.calls.append({k: np.asarray(v).shape for k, v in batch.items()})
        p = 1.0 / (1.0 + np.exp(-pc[..., 0]))
        fine = np.round(10.0 * pc[..., 2]).astype(np.int32)
        return p.astype(np.float32), fine


def _batch(rng, B, N):
    return dict(pc=rng.normal(size=(B, N, 3)).astype(np.float32),
                intensity=rng.random((B, N, 1), dtype=np.float32),
                sn=rng.normal(size=(B, N, 3)).astype(np.float32),
                img=np.zeros((B, 8, 8, 3), np.float32),
                K=np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))


@pytest.mark.parametrize("N,sub_n", [(96, 32), (100, 32), (64, 64), (24, 32)])
def test_ensemble_reproduces_per_point_function(N, sub_n):
    rng = np.random.default_rng(0)
    batch = _batch(rng, 2, N)
    eng = _StubEngine(sub_n)
    ens = SubsampleEnsemble(eng, seed=3)
    p, fine = ens.infer_probs(None, batch)
    assert p.shape == (2, N) and fine.shape == (2, N)
    p_ref = 1.0 / (1.0 + np.exp(-batch["pc"][..., 0]))
    # every point covered >= 1x; duplicates average identical values, so
    # the result equals the per-point function exactly (float64 (v+v)/2)
    np.testing.assert_allclose(p, p_ref, rtol=1e-6)
    np.testing.assert_array_equal(
        fine, np.round(10.0 * batch["pc"][..., 2]).astype(np.int32))
    # every sub-batch presented at the trained geometry
    for call in eng.calls:
        assert call["pc"] == (2, sub_n, 3)
        assert call["intensity"] == (2, sub_n, 1)
        assert call["sn"] == (2, sub_n, 3)
        assert call["node_a"] == (2, eng.cfg.node_a_num, 3)
        assert call["node_b"] == (2, eng.cfg.node_b_num, 3)
    assert len(eng.calls) == -(-N // sub_n)


def test_ensemble_infer_is_thresholded_probs():
    rng = np.random.default_rng(1)
    batch = _batch(rng, 1, 80)
    ens = SubsampleEnsemble(_StubEngine(32), seed=0)
    p, _ = SubsampleEnsemble(_StubEngine(32), seed=0).infer_probs(None, batch)
    coarse, fine = ens.infer(None, batch)
    np.testing.assert_array_equal(coarse, (p > 0.5).astype(np.int32))
    assert fine is not None


@pytest.mark.parametrize("repeats", [2, 3])
def test_ensemble_repeats_exact_and_coverage(repeats):
    """repeats=R must still reproduce a pure per-point function exactly
    (identical values average to themselves) and run R covers' worth of
    sub-batches."""
    rng = np.random.default_rng(4)
    N, sub_n = 100, 32
    batch = _batch(rng, 2, N)
    eng = _StubEngine(sub_n)
    p, fine = SubsampleEnsemble(eng, seed=3,
                                repeats=repeats).infer_probs(None, batch)
    p_ref = 1.0 / (1.0 + np.exp(-batch["pc"][..., 0]))
    np.testing.assert_allclose(p, p_ref, rtol=1e-6)
    np.testing.assert_array_equal(
        fine, np.round(10.0 * batch["pc"][..., 2]).astype(np.int32))
    assert len(eng.calls) == repeats * -(-N // sub_n)


def test_ensemble_repeats_reduces_context_variance():
    """With a subset-context-dependent stub, more repeats must pull the
    averaged probability toward the context-free value (law of large
    numbers over independent covers)."""
    rng = np.random.default_rng(7)
    batch = _batch(rng, 2, 96)

    class _ContextStub(_StubEngine):
        def infer_probs(self, state, b):
            pc = np.asarray(b["pc"])
            # per-point signal + a pure context term (subset mean)
            p = 1.0 / (1.0 + np.exp(-(pc[..., 0] + 3.0 * pc[..., 1].mean())))
            return p.astype(np.float32), None

    p_ref = 1.0 / (1.0 + np.exp(-batch["pc"][..., 0]))
    errs = []
    for repeats in (1, 8):
        p, _ = SubsampleEnsemble(_ContextStub(32), seed=11,
                                 repeats=repeats).infer_probs(None, batch)
        errs.append(float(np.abs(p - p_ref).mean()))
    assert errs[1] < errs[0]


class _FineProbStub(_StubEngine):
    """Engine exposing ``infer_probs_fine``: per-point fine distribution
    softmax(3 * onehot(round(10z) % C) + context), context = subset mean.
    With context=0 the argmax equals the per-point cell exactly."""

    C = 5

    def __init__(self, sub_n, context_scale=0.0):
        super().__init__(sub_n)
        self.context_scale = context_scale

    def infer_probs_fine(self, state, b):
        pc = np.asarray(b["pc"])
        self.calls.append({k: np.asarray(v).shape for k, v in b.items()})
        p = 1.0 / (1.0 + np.exp(-pc[..., 0]))
        cell = (np.round(10.0 * pc[..., 2]).astype(np.int64)) % self.C
        logits = 3.0 * np.eye(self.C, dtype=np.float32)[cell]
        if self.context_scale:
            # a context term that favors a subset-dependent OTHER cell
            ctx_cell = int(abs(pc[..., 1].mean()) * 1e3) % self.C
            logits[..., ctx_cell] += self.context_scale
        e = np.exp(logits - logits.max(-1, keepdims=True))
        return p.astype(np.float32), (e / e.sum(-1, keepdims=True))


def test_ensemble_fine_probs_reproduce_per_point_cells():
    """With ``infer_probs_fine`` available the ensemble must average the
    fine DISTRIBUTIONS and argmax at the end — for a pure per-point
    distribution that equals the per-point cell everywhere."""
    rng = np.random.default_rng(9)
    N, sub_n = 100, 32
    batch = _batch(rng, 2, N)
    eng = _FineProbStub(sub_n)
    p, fine = SubsampleEnsemble(eng, seed=3, repeats=2).infer_probs(
        None, batch)
    p_ref = 1.0 / (1.0 + np.exp(-batch["pc"][..., 0]))
    np.testing.assert_allclose(p, p_ref, rtol=1e-5)
    cell_ref = (np.round(10.0 * batch["pc"][..., 2]).astype(np.int64)
                ) % _FineProbStub.C
    np.testing.assert_array_equal(fine, cell_ref.astype(np.int32))
    assert len(eng.calls) == 2 * -(-N // sub_n)


def test_ensemble_fine_probs_repeats_reduce_context_errors():
    """Cover-averaging must wash a subset-context term out of the fine
    argmax: more repeats -> fewer fine cell errors vs the per-point
    truth (keep-last integer cells could not improve with repeats)."""
    rng = np.random.default_rng(12)
    batch = _batch(rng, 2, 96)
    cell_ref = (np.round(10.0 * batch["pc"][..., 2]).astype(np.int64)
                ) % _FineProbStub.C
    errs = []
    for repeats in (1, 8):
        _, fine = SubsampleEnsemble(
            _FineProbStub(32, context_scale=3.2), seed=11,
            repeats=repeats).infer_probs(None, batch)
        errs.append(float((fine != cell_ref).mean()))
    assert errs[1] < errs[0]


def test_ensemble_deterministic_given_seed():
    rng = np.random.default_rng(2)
    batch = _batch(rng, 2, 100)

    class _NoisyStub(_StubEngine):
        # output depends on the SUBSET mean too, so a different cover
        # produces different numbers — determinism must come from the seed
        def infer_probs(self, state, b):
            pc = np.asarray(b["pc"])
            p = 1.0 / (1.0 + np.exp(-(pc[..., 0] + pc[..., 1].mean())))
            return p.astype(np.float32), None

    p1, f1 = SubsampleEnsemble(_NoisyStub(32), seed=5).infer_probs(None, batch)
    p2, f2 = SubsampleEnsemble(_NoisyStub(32), seed=5).infer_probs(None, batch)
    p3, _ = SubsampleEnsemble(_NoisyStub(32), seed=6).infer_probs(None, batch)
    np.testing.assert_array_equal(p1, p2)
    assert f1 is None and f2 is None
    assert not np.array_equal(p1, p3)
