"""Golden-file regression tests (the reference's GENERATE_EXPECTED pattern,
tests/test_eval_model.py / test_train.py).

Regenerate with:  GENERATE_EXPECTED=1 python -m pytest tests/test_golden.py
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

EXPECTED_DIR = Path(__file__).parent / "expected"
GENERATE = os.environ.get("GENERATE_EXPECTED") == "1"


def _check_or_generate(name, results, rtol=1e-4):
    EXPECTED_DIR.mkdir(exist_ok=True)
    path = EXPECTED_DIR / f"{name}.json"
    if GENERATE or not path.exists():
        with open(path, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        if GENERATE:
            pytest.skip(f"generated {path}")
    with open(path) as f:
        expected = json.load(f)
    assert set(results) == set(expected)
    for k, v in expected.items():
        np.testing.assert_allclose(results[k], v, rtol=rtol, err_msg=k)


class TestGoldenEval:
    def test_factorized_entropy_estimation(self):
        """eval_model numbers on the fake dataset must stay stable."""
        import io
        from contextlib import redirect_stdout

        from flashgmm_tpu.utils.eval_model.__main__ import main

        buf = io.StringIO()
        with redirect_stdout(buf):
            main([
                "random", str(Path(__file__).parent / "assets/fakedata/imagefolder/test"),
                "-a", "bmshj2018-factorized", "-N", "32", "-M", "48",
                "--entropy-estimation",
            ])
        out = json.loads(buf.getvalue())
        results = {
            k: v for k, v in out["results"].items()
            if "time" not in k
        }
        _check_or_generate("eval_factorized_ee", results)


class TestGoldenTrain:
    def test_seeded_train_losses(self):
        """A few seeded train steps produce stable losses (training
        determinism; reference tests/test_train.py:44-90)."""
        import jax
        import jax.numpy as jnp
        from flax import nnx

        from flashgmm_tpu.models import FactorizedPrior
        from flashgmm_tpu.parallel import make_train_state
        from flashgmm_tpu.parallel.train import data_parallel_train_step

        model = FactorizedPrior(16, 24, rngs=nnx.Rngs(42))
        opt_net, opt_aux = make_train_state(model, 1e-4, 1e-3)
        rs = np.random.RandomState(42)
        x = jnp.asarray(rs.rand(2, 32, 32, 3).astype(np.float32))
        key = jax.random.key(42)
        losses = []
        for _ in range(3):
            key, sub = jax.random.split(key)
            out = data_parallel_train_step(model, opt_net, opt_aux, x, sub, 0.01)
            losses.append(round(float(out["loss"]), 4))
        _check_or_generate("train_seeded_losses", {"losses": losses}, rtol=1e-3)
