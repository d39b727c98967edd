"""Composed end-to-end parity gate in the suite (VERDICT r3 item 1).

One test that chains every parity claim the suite otherwise evidences
piecewise: reference-format checkpoint -> torch batch-1 forward + oracle
postproc (the reference algorithm chain) vs import_torch_checkpoint ->
full InferenceEngine.segment (dense, batch > 1, tiled), asserting
per-frame mask IoU >= 0.99.  See scripts/parity_gate.py for the harness
and the on-chip (production bf16) probe.
"""

import jax
import pytest


class TestComposedParityGate:
    def test_reference_chain_vs_full_engine(self, tmp_path):
        from scripts.parity_gate import run_gate

        torch = pytest.importorskip("torch")  # noqa: F841

        # run_gate pins matmul precision to 'highest' for the f32 chain
        # (XLA truncates f32 convs to bf16 at default precision on
        # AVX512-BF16 CPUs and the TPU MXU alike); restore afterwards so
        # other tests keep the default executables
        prev = jax.config.jax_default_matmul_precision
        try:
            # epochs=60: the gate needs CONFIDENT fields — at 40 epochs the
            # tiny model's plateaus make watershed tie-breaking genuinely
            # ambiguous (measured min IoU 0.797 at 40 vs 0.992 at 60).
            # gn + dense/batch legs: the suite tier (bn's per-epoch precise
            # recalibration triples training time, and gn's tiled leg would
            # measure GroupNorm's tile-statistics coupling, not pipeline
            # parity — scripts/parity_gate.py runs the full bn + tiled
            # variant, results in docs/E2E_RESULTS.md)
            res = run_gate(tmp_path, seed=0, crop=64, frame=128,
                           n_frames=2, epochs=60, dtype="float32",
                           normalization="gn", tiled=False)
        finally:
            jax.config.update("jax_default_matmul_precision", prev)

        # non-vacuity: the frames must actually contain instances
        assert all(n >= 5 for n in res["n_instances_ref"]), res
        assert res["min_iou"] >= 0.99, res
