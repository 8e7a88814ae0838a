"""Driver-facing artifacts: bench.py and __graft_entry__ must stay importable
and structurally intact (their actual execution happens on the TPU driver)."""
import importlib.util
import os
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_importable_and_configured():
    bench = _load("bench_module", os.path.join(REPO, "bench.py"))
    assert bench.BASELINE_REGS_PER_SEC == 500.0
    assert bench.N_INITS % 8 == 0          # pallas init-block constraint
    assert callable(bench.main)


def test_graft_entry_traces():
    sys.path.insert(0, REPO)
    g = _load("graft_entry", os.path.join(REPO, "__graft_entry__.py"))
    fn, (variables, batch) = g.entry()
    out = jax.eval_shape(fn, variables, batch)
    coarse, fine = out
    assert coarse.shape[-1] == 2
    assert callable(g.dryrun_multichip)
