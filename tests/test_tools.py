"""Tests for analysis tools + profiling utilities."""

import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig
from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
    RandomBatchLoader,
)
from deep_quantized_recommendation_model_dqrm_tpu.tools.analysis import (
    RowHotness,
    audit_batches,
    comm_volume_report,
    embedding_projection,
    model_size_report,
    table_weight_stats,
)
from deep_quantized_recommendation_model_dqrm_tpu.utils.profiling import (
    PhaseStats,
    StepTimer,
)

CFG = DLRMConfig(
    table_sizes=(50, 20, 10),
    embedding_dim=8,
    mlp_bot=(4, 16, 8),
    mlp_top=(14, 8, 1),
)


class TestHotness:
    def test_counts_and_ranking(self, tmp_path):
        h = RowHotness((10, 5))
        idx = np.array([[[0], [0], [3]], [[1], [1], [1]]])  # [2, 3, 1]
        h.update(idx)
        assert h.counts[0][0] == 2 and h.counts[0][3] == 1
        assert h.ranking(1)[0] == 1
        assert np.isclose(h.hot_fraction(1, 1), 1.0)
        paths = h.dump(str(tmp_path))
        assert len(paths) == 2

    def test_audit_clean_loader(self):
        loader = RandomBatchLoader(CFG, 16, 4, seed=0)
        rep = audit_batches(loader, CFG.table_sizes, num_dense=4)
        assert rep["clean"] and rep["batches_scanned"] == 4

    def test_audit_flags_out_of_range(self):
        class Bad:
            def __iter__(self):
                for b in RandomBatchLoader(CFG, 8, 1, seed=0):
                    yield b._replace(indices=b.indices.at[0, 0, 0].set(9999))

        rep = audit_batches(Bad(), CFG.table_sizes, num_dense=4)
        assert not rep["clean"] and rep["out_of_range"][0][1] == [0]


class TestReports:
    def test_model_size_8x(self):
        r32 = model_size_report((1000, 2000), 16, (13, 64, 16), (20, 8, 1))
        r4 = model_size_report(
            (1000, 2000), 16, (13, 64, 16), (20, 8, 1), emb_bits=4, mlp_bits=4
        )
        assert np.isclose(r4["compression"], 8.0, rtol=0.01)
        assert r32["compression"] == 1.0

    def test_comm_volume_sparse_much_smaller(self):
        r = comm_volume_report(
            (10_000_000, 10_000_000), 16, (13, 512, 64), (40, 256, 1),
            batch_per_rank=128, grad_bits=8, world_size=4,
        )
        assert r["reduction"] > 100  # GB -> MB, paper Table 4

    def test_weight_stats(self):
        t = np.random.RandomState(0).uniform(-0.1, 0.1, (100, 8))
        s = table_weight_stats([t])[0]
        assert s["rows"] == 100 and 0.0 <= s["frac_outside_init"] <= 1.0

    def test_projection_shape(self):
        t = np.random.RandomState(1).normal(size=(200, 16))
        p = embedding_projection(t)
        assert p.shape == (200, 2)


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        for _ in range(5):
            t.step()
        ms = t.lap()
        assert ms >= 0.0

    def test_phase_stats(self):
        ps = PhaseStats()
        with ps.phase("fwd"):
            pass
        with ps.phase("fwd"):
            pass
        stats = ps.stats_and_clear()
        assert "fwd" in stats and stats["fwd"][0] >= 0.0
        assert ps.stats_and_clear() == {}


class TestLogging:
    def test_scalar_logger_jsonl(self, tmp_path):
        import json

        from deep_quantized_recommendation_model_dqrm_tpu.utils.logging import (
            ScalarLogger,
        )

        lg = ScalarLogger(str(tmp_path), "run1")
        lg.add_scalar("Train/Loss", 0.5, 10)
        lg.add_scalar("Test/Acc", 0.78, 20)
        lg.close()
        lines = [json.loads(l) for l in open(lg.path)]
        assert lines[0]["tag"] == "Train/Loss" and lines[0]["step"] == 10
        assert lines[1]["value"] == 0.78

    def test_scalar_logger_disabled(self):
        from deep_quantized_recommendation_model_dqrm_tpu.utils.logging import (
            ScalarLogger,
        )

        lg = ScalarLogger(None)
        lg.add_scalar("x", 1.0, 0)  # no-op, no crash
        lg.close()

    def test_mlperf_logger_events(self, tmp_path):
        import json

        from deep_quantized_recommendation_model_dqrm_tpu.utils.logging import (
            MLPerfLogger,
        )

        p = str(tmp_path / "ml.jsonl")
        ml = MLPerfLogger(p, rank=0)
        ml.start("run")
        ml.event("epoch", 1, {"k": "v"})
        ml.end("run")
        lines = [json.loads(l) for l in open(p)]
        assert [l["kind"] for l in lines] == ["start", "event", "end"]
        # rank-gated: rank 1 writes nothing
        ml1 = MLPerfLogger(str(tmp_path / "ml1.jsonl"), rank=1)
        ml1.start("x")
        import os

        assert not os.path.exists(str(tmp_path / "ml1.jsonl"))


class TestTFEvents:
    """The hand-rolled tfevents writer produces files the REAL TensorBoard
    event loader parses (reference writes tfevents via SummaryWriter,
    dlrm_s_pytorch.py:1497-1498)."""

    def test_tensorboard_loads_scalars(self, tmp_path):
        import pytest
        pytest.importorskip("tensorboard")
        from deep_quantized_recommendation_model_dqrm_tpu.utils.tfevents import (
            TFEventWriter,
        )

        w = TFEventWriter(str(tmp_path))
        w.add_scalar("Train/Loss", 0.75, 1)
        w.add_scalar("Train/Loss", 0.5, 2)
        w.add_scalar("Test/Acc", 0.8, 2)
        w.close()

        from tensorboard.backend.event_processing import event_file_loader

        events = list(
            event_file_loader.EventFileLoader(w.path).Load()
        )
        assert events[0].file_version == "brain.Event:2"
        # the loader migrates simple_value into a scalar tensor with plugin
        # metadata (data_compat) — i.e. TensorBoard fully understands the file
        scalars = [
            (e.step, v.tag,
             v.tensor.float_val[0] if v.tensor.float_val else v.simple_value)
            for e in events
            if e.summary.value
            for v in e.summary.value
        ]
        assert (1, "Train/Loss", 0.75) in scalars
        assert any(s == 2 and t == "Test/Acc" and abs(v - 0.8) < 1e-6
                   for s, t, v in scalars)

    def test_scalar_logger_writes_tfevents(self, tmp_path):
        from deep_quantized_recommendation_model_dqrm_tpu.utils.logging import (
            ScalarLogger,
        )

        lg = ScalarLogger(str(tmp_path))
        lg.add_scalar("Train/Loss", 0.6, 10)
        lg.close()
        import glob

        assert glob.glob(str(tmp_path / "events.out.tfevents.*"))
