"""Data pipeline tests: raw TSV preprocessing, splits, binary format,
native C++ parser parity."""

import os

import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.data import native_ext
from deep_quantized_recommendation_model_dqrm_tpu.data.binary import (
    CriteoBinDataset,
    numpy_to_binary,
)
from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
    CriteoDataset,
    _parse_lines_numpy,
    preprocess_criteo,
)


def write_raw(path, n_rows, seed=0):
    """Synthetic Criteo-format TSV: label \t 13 ints \t 26 hex cats, with
    some blank fields like the real data."""
    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        for i in range(n_rows):
            label = rng.randint(0, 2)
            dense = [
                b"" if rng.rand() < 0.1 else str(rng.randint(-3, 500)).encode()
                for _ in range(13)
            ]
            cats = [
                b"" if rng.rand() < 0.05 else format(rng.randint(0, 1 << 32), "08x").encode()
                for _ in range(26)
            ]
            f.write(
                str(label).encode() + b"\t" + b"\t".join(dense) + b"\t" + b"\t".join(cats) + b"\n"
            )
    return path


class TestParser:
    def test_python_parser_fields(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 50)
        lines = open(raw, "rb").readlines()
        dicts = [dict() for _ in range(26)]
        y, xi, xc = _parse_lines_numpy(lines, dicts)
        assert y.shape == (50,) and xi.shape == (50, 13) and xc.shape == (50, 26)
        assert set(np.unique(y)).issubset({0, 1})
        # dictionary ids are dense 0..n-1 per column
        for j in range(26):
            vals = np.unique(xc[:, j])
            assert vals.max() < len(dicts[j]) or len(dicts[j]) == 0

    @pytest.mark.skipif(not native_ext.available(), reason="no C++ toolchain")
    def test_native_matches_python(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 200, seed=3)
        lines = open(raw, "rb").readlines()
        y_n, xi_n, xc_n = native_ext.parse_lines(lines)
        y_p, xi_p, xc_p = _parse_lines_numpy(lines, None)
        np.testing.assert_array_equal(y_n, y_p)
        np.testing.assert_array_equal(xi_n, xi_p)
        np.testing.assert_array_equal(xc_n, xc_p)

    @pytest.mark.skipif(not native_ext.available(), reason="no C++ toolchain")
    def test_native_parse_file(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 300, seed=4)
        y, xi, xc = native_ext.parse_file(raw, 1000)
        assert len(y) == 300
        y_p, xi_p, xc_p = _parse_lines_numpy(open(raw, "rb").readlines(), None)
        np.testing.assert_array_equal(xc, xc_p)


class TestPreprocess:
    def test_preprocess_and_splits(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 700, seed=1)
        out = str(tmp_path / "proc")
        paths = preprocess_criteo(raw, out, num_days=7, use_native=False)
        assert len(paths) == 7
        train = CriteoDataset(out, "train")
        val = CriteoDataset(out, "val")
        test = CriteoDataset(out, "test")
        assert len(train) == 600
        assert len(val) + len(test) == 100
        # reference split semantics (dlrm_data_pytorch.py:144-145): test =
        # the FIRST ceil(n/2) rows of the last day, val = the remainder
        assert len(test) == -(-100 // 2)
        assert len(val) == 100 - len(test)
        t_range = test._split_range()
        v_range = val._split_range()
        assert t_range == [(6, 0, len(test))]
        assert v_range == [(6, len(test), 100)]
        sizes = train.table_sizes
        assert len(sizes) == 26 and all(s >= 1 for s in sizes)

    def test_val_split_disjoint_and_covering(self, tmp_path):
        """val + test cover the last day with no overlap, odd length."""
        raw = write_raw(str(tmp_path / "raw.txt"), 150, seed=7)
        out = str(tmp_path / "proc")
        preprocess_criteo(raw, out, num_days=3, use_native=False)
        val = CriteoDataset(out, "val")
        test = CriteoDataset(out, "test")
        day_len = test.day_lens[-1]
        assert len(test) == -(-day_len // 2)  # ceil half first
        assert len(val) == day_len - len(test)
        tb = list(test.iter_batches(1, drop_last=False))
        vb = list(val.iter_batches(1, drop_last=False))
        assert len(tb) == len(test) and len(vb) == len(val)
        # disjoint: dense rows of val never appear among test rows (seeded
        # 13-dim float rows are unique with prob ~1)
        t_rows = {tuple(np.asarray(b.dense[0]).tolist()) for b in tb}
        v_rows = {tuple(np.asarray(b.dense[0]).tolist()) for b in vb}
        assert not (t_rows & v_rows)

    def test_batch_layout_and_log1p(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 300, seed=2)
        out = str(tmp_path / "proc")
        preprocess_criteo(raw, out, num_days=3, use_native=False)
        ds = CriteoDataset(out, "train")
        batches = list(ds.iter_batches(64))
        assert len(batches) == 200 // 64
        b = batches[0]
        assert b.dense.shape == (64, 13)
        assert b.indices.shape == (26, 64, 1)
        assert b.labels.shape == (64,)
        assert float(b.dense.min()) >= 0.0  # log1p of clamped values
        # indices within table sizes
        sizes = np.asarray(ds.table_sizes)
        assert np.all(np.asarray(b.indices)[:, :, 0].max(axis=1) < sizes)

    def test_subsample_drops_only_zeros(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 500, seed=5)
        out = str(tmp_path / "proc")
        preprocess_criteo(raw, out, num_days=2, sub_sample_rate=0.9, use_native=False)
        total_ones_raw = sum(
            int(l.split(b"\t")[0]) for l in open(raw, "rb").readlines()
        )
        ones = zeros = 0
        for d in range(2):
            z = np.load(os.path.join(out, f"day_{d}.npz"))
            ones += int((z["y"] == 1).sum())
            zeros += int((z["y"] == 0).sum())
        assert ones == total_ones_raw  # all positives kept
        assert zeros < (500 - total_ones_raw) * 0.3  # most zeros dropped

    def test_max_ind_range_hashing(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 200, seed=6)
        out = str(tmp_path / "proc")
        preprocess_criteo(raw, out, num_days=2, use_native=False)
        ds = CriteoDataset(out, "train", max_ind_range=7)
        b = next(ds.iter_batches(32))
        assert int(np.asarray(b.indices).max()) < 7

    @pytest.mark.skipif(not native_ext.available(), reason="no C++ toolchain")
    def test_native_preprocess_matches_python(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 300, seed=7)
        out_py = str(tmp_path / "py")
        out_cc = str(tmp_path / "cc")
        preprocess_criteo(raw, out_py, num_days=2, use_native=False)
        preprocess_criteo(raw, out_cc, num_days=2, use_native=True)
        for d in range(2):
            a = np.load(os.path.join(out_py, f"day_{d}.npz"))
            b = np.load(os.path.join(out_cc, f"day_{d}.npz"))
            np.testing.assert_array_equal(a["y"], b["y"])
            np.testing.assert_array_equal(a["X_int"], b["X_int"])
            np.testing.assert_array_equal(a["X_cat"], b["X_cat"])


class TestBinary:
    def test_roundtrip(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 400, seed=8)
        out = str(tmp_path / "proc")
        paths = preprocess_criteo(raw, out, num_days=2, use_native=False)
        bin_path = str(tmp_path / "data.bin")
        n = numpy_to_binary(paths, bin_path)
        assert n == 400
        ds = CriteoBinDataset(bin_path, batch_size=50)
        assert len(ds) == 8
        b0 = ds[0]
        assert b0.dense.shape == (50, 13)
        assert b0.indices.shape == (26, 50, 1)
        # first record matches the npz source
        z = np.load(paths[0])
        np.testing.assert_allclose(
            np.asarray(b0.dense[0]),
            np.log1p(np.maximum(z["X_int"][0], 0).astype(np.float32)),
        )
        np.testing.assert_array_equal(
            np.asarray(b0.indices)[:, 0, 0], z["X_cat"][0].astype(np.int32)
        )

    def test_rank_sharding(self, tmp_path):
        raw = write_raw(str(tmp_path / "raw.txt"), 400, seed=9)
        out = str(tmp_path / "proc")
        paths = preprocess_criteo(raw, out, num_days=2, use_native=False)
        bin_path = str(tmp_path / "data.bin")
        numpy_to_binary(paths, bin_path)
        r0 = CriteoBinDataset(bin_path, batch_size=50, rank=0, world_size=2)
        r1 = CriteoBinDataset(bin_path, batch_size=50, rank=1, world_size=2)
        assert len(r0) == len(r1) == 4
        # disjoint batches
        a = np.asarray(r0[0].labels)
        b = np.asarray(r1[0].labels)
        full = CriteoBinDataset(bin_path, batch_size=50)
        np.testing.assert_array_equal(a, np.asarray(full[0].labels))
        np.testing.assert_array_equal(b, np.asarray(full[1].labels))


class TestParserRobustness:
    def test_malformed_lines_tolerated(self, tmp_path):
        """Truncated rows, blank lines, junk characters — both parsers must
        not crash and must agree."""
        lines = [
            b"1\t5\t\t3" + b"\t" * 10 + b"\tabc123\tdeadbeef" + b"\t" * 24 + b"\n",
            b"0\n",  # label only
            b"\n",  # blank
            b"1" + b"\t" * 39 + b"\n",  # all-empty fields
            b"0\t-3\t999999" + b"\t" * 11 + b"\tffffffff" * 1 + b"\t" * 25 + b"\n",
        ]
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            _parse_lines_numpy,
        )

        y, xi, xc = _parse_lines_numpy(lines, None)
        assert y.shape == (5,)
        assert np.all(np.isin(y, [0, 1]))
        if native_ext.available():
            y2, xi2, xc2 = native_ext.parse_lines(lines)
            np.testing.assert_array_equal(y, y2)
            np.testing.assert_array_equal(xi, xi2)
            np.testing.assert_array_equal(xc, xc2)

    def test_negative_dense_values(self, tmp_path):
        line = [b"1\t-3\t-1\t0" + b"\t" * 10 + b"\t0a" + b"\t" * 25 + b"\n"]
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            _parse_lines_numpy,
        )

        y, xi, xc = _parse_lines_numpy(line, None)
        assert xi[0, 0] == -3 and xi[0, 1] == -1
        if native_ext.available():
            _, xi2, _ = native_ext.parse_lines(line)
            np.testing.assert_array_equal(xi, xi2)


class TestOffsetsInterop:
    def test_batch_from_offsets_variable_bags(self):
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            batch_from_offsets,
        )

        # 2 tables, 3 samples; table 0 bags: [5], [6,7], []; table 1: [1],[2],[3]
        lS_o = np.array([[0, 1, 3], [0, 1, 2]])
        lS_i = [np.array([5, 6, 7]), np.array([1, 2, 3])]
        dense = np.ones((3, 13))
        b = batch_from_offsets(dense, lS_o, lS_i, [1, 0, 1], pooling_size=2)
        assert b.indices.shape == (2, 3, 2)
        np.testing.assert_array_equal(np.asarray(b.indices[0, 1]), [6, 7])
        np.testing.assert_array_equal(np.asarray(b.mask[0]), [[1, 0], [1, 1], [0, 0]])
        # pooled lookup semantics: empty bag contributes zero
        import jax.numpy as jnp

        from deep_quantized_recommendation_model_dqrm_tpu.ops.embedding import (
            pooled_lookup,
        )

        table = jnp.arange(20.0).reshape(10, 2)
        out = pooled_lookup(table, b.indices[0], b.mask[0])
        np.testing.assert_allclose(np.asarray(out)[2], [0.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(out)[1], np.asarray(table[6] + table[7])
        )


class TestTerabyteDayFiles:
    def test_per_day_raw_files(self, tmp_path):
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            preprocess_criteo_days,
        )

        raws = [
            write_raw(str(tmp_path / f"day_{d}.txt"), 100 + 10 * d, seed=d)
            for d in range(3)
        ]
        paths = preprocess_criteo_days(raws, str(tmp_path / "proc"), use_native=False)
        assert len(paths) == 3
        ds = CriteoDataset(str(tmp_path / "proc"), "train")
        assert len(ds) == 100 + 110  # days 0,1; day 2 is val/test
        # dictionaries shared across days: ids stay dense
        z2 = np.load(paths[2])
        sizes = np.asarray(ds.table_sizes)
        assert np.all(z2["X_cat"].max(axis=0) < sizes)


class TestPrefetch:
    def test_prefetch_yields_all_batches_in_order(self):
        from deep_quantized_recommendation_model_dqrm_tpu.config import DLRMConfig
        from deep_quantized_recommendation_model_dqrm_tpu.data.prefetch import (
            prefetch,
        )
        from deep_quantized_recommendation_model_dqrm_tpu.data.synthetic import (
            RandomBatchLoader,
        )

        cfg = DLRMConfig(table_sizes=(10, 5), embedding_dim=4,
                         mlp_bot=(4, 4), mlp_top=(7, 1))
        loader = RandomBatchLoader(cfg, 8, 12, seed=0)
        direct = [np.asarray(b.labels) for b in loader]
        fetched = [np.asarray(b.labels) for b in prefetch(loader, depth=4)]
        assert len(fetched) == 12
        for a, b in zip(direct, fetched):
            np.testing.assert_array_equal(a, b)

    def test_prefetch_propagates_errors(self):
        from deep_quantized_recommendation_model_dqrm_tpu.data.prefetch import (
            prefetch,
        )

        def bad():
            yield 1
            raise ValueError("boom")

        it = prefetch(bad(), depth=2)
        assert next(it) == 1
        with pytest.raises(ValueError, match="boom"):
            next(it)


class TestParallelPreprocess:
    def test_parallel_matches_serial_up_to_id_bijection(self, tmp_path):
        """preprocess_criteo_days_parallel: labels/dense identical to the
        serial path; categorical ids are a consistent per-column bijection
        (ids are arbitrary labels — the reference's multiprocessing path
        also reassigns them during the per-day dict merge,
        data_utils.py:1080-1290)."""
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            preprocess_criteo_days,
            preprocess_criteo_days_parallel,
        )

        raws = [
            write_raw(str(tmp_path / f"raw_{d}.txt"), 120, seed=10 + d)
            for d in range(3)
        ]
        p_ser = preprocess_criteo_days(raws, str(tmp_path / "ser"), use_native=False)
        p_par = preprocess_criteo_days_parallel(
            raws, str(tmp_path / "par"), use_native=False, workers=2
        )
        assert len(p_ser) == len(p_par) == 3
        cs = np.load(str(tmp_path / "ser" / "counts.npz"))["counts"]
        cp = np.load(str(tmp_path / "par" / "counts.npz"))["counts"]
        np.testing.assert_array_equal(cs, cp)
        fwd = [dict() for _ in range(26)]
        bwd = [dict() for _ in range(26)]
        for ps, pp in zip(p_ser, p_par):
            zs, zp = np.load(ps), np.load(pp)
            np.testing.assert_array_equal(zs["y"], zp["y"])
            np.testing.assert_array_equal(zs["X_int"], zp["X_int"])
            for j in range(26):
                for a, b in zip(zs["X_cat"][:, j], zp["X_cat"][:, j]):
                    a, b = int(a), int(b)
                    assert fwd[j].setdefault(a, b) == b
                    assert bwd[j].setdefault(b, a) == a

    def test_parallel_single_worker_path(self, tmp_path):
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            CriteoDataset,
            preprocess_criteo_days_parallel,
        )

        raws = [
            write_raw(str(tmp_path / f"r_{d}.txt"), 80, seed=20 + d)
            for d in range(2)
        ]
        preprocess_criteo_days_parallel(
            raws, str(tmp_path / "out"), workers=1, use_native=False
        )
        ds = CriteoDataset(str(tmp_path / "out"), "train")
        b = next(ds.iter_batches(16))
        assert b.dense.shape == (16, 13)

    def test_streaming_chunks_match_whole_file(self, tmp_path):
        """_iter_text_chunks with a tiny chunk size reassembles the file."""
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            _iter_text_chunks,
        )

        raw = write_raw(str(tmp_path / "s.txt"), 200, seed=5)
        whole = open(raw, "rb").read()
        stitched = b"".join(_iter_text_chunks(raw, chunk_bytes=1000))
        assert stitched == whole


class TestDataRandomize:
    def test_shuffle_rows_preserves_samples(self, tmp_path):
        """--data-randomize="day" semantics: within-day permutation, same
        multiset of samples (transformCriteoAdData, data_utils.py:756-840)."""
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            CriteoDataset,
            preprocess_criteo,
        )

        raw = write_raw(str(tmp_path / "raw.txt"), 300, seed=4)
        out = str(tmp_path / "proc")
        preprocess_criteo(raw, out, num_days=2, use_native=False)
        ds = CriteoDataset(out, "train")

        def labels(shuffle_rows, seed=1):
            out_l = []
            for b in ds.iter_batches(25, shuffle_rows=shuffle_rows, seed=seed):
                out_l.append(np.asarray(b.labels))
            return np.concatenate(out_l)

        plain = labels(False)
        shuf = labels(True)
        assert len(plain) == len(shuf)
        # deterministic per seed, different order, same multiset
        np.testing.assert_array_equal(shuf, labels(True))
        assert sorted(plain.tolist()) == sorted(shuf.tolist())


class TestGlobalShuffle:
    """Memory-bounded external shuffle = the reference's preprocessing-time
    --data-randomize=total global reorder (transformCriteoAdData)."""

    def _build(self, tmp_path, n_rows=600, days=4):
        raw = write_raw(str(tmp_path / "raw.txt"), n_rows, seed=3)
        out = str(tmp_path / "proc")
        paths = preprocess_criteo(raw, out, num_days=days, use_native=False)
        return paths

    @staticmethod
    def _rows(paths):
        rows = []
        lens = []
        for p in paths:
            d = np.load(p)
            recs = np.concatenate(
                [d["y"].reshape(-1, 1), d["X_int"], d["X_cat"]], axis=1
            ).astype(np.int64)
            rows.append(recs)
            lens.append(len(recs))
        return np.concatenate(rows), lens

    def test_permutation_multiset_and_day_lengths(self, tmp_path):
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            global_shuffle_days,
        )

        paths = self._build(tmp_path)
        before, lens_before = self._rows(paths)
        # tiny buckets force the multi-bucket spill path
        global_shuffle_days(paths, seed=7, rows_per_bucket=50)
        after, lens_after = self._rows(paths)
        assert lens_after == lens_before  # split geometry preserved
        # exact multiset equality: sort rows lexicographically and compare
        key = lambda a: a[np.lexsort(a.T[::-1])]
        np.testing.assert_array_equal(key(before), key(after))
        # and it actually moved things
        assert not np.array_equal(before, after)

    def test_mixes_across_days(self, tmp_path):
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            global_shuffle_days,
        )

        paths = self._build(tmp_path)
        day0_before = set(map(tuple, self._rows(paths[:1])[0]))
        global_shuffle_days(paths, seed=1, rows_per_bucket=50)
        day0_after = set(map(tuple, self._rows(paths[:1])[0]))
        # day 0 must now contain rows that were NOT in day 0 (600 rows over
        # 4 days: the probability of a no-mix outcome is astronomically 0)
        assert len(day0_after - day0_before) > 0

    def test_deterministic_under_seed(self, tmp_path):
        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            global_shuffle_days,
        )

        (tmp_path / "a").mkdir()
        (tmp_path / "b").mkdir()
        p1 = self._build(tmp_path / "a")
        p2 = self._build(tmp_path / "b")
        global_shuffle_days(p1, seed=9, rows_per_bucket=64)
        global_shuffle_days(p2, seed=9, rows_per_bucket=64)
        r1, _ = self._rows(p1)
        r2, _ = self._rows(p2)
        np.testing.assert_array_equal(r1, r2)

    def test_no_leftover_bucket_files(self, tmp_path):
        import glob

        from deep_quantized_recommendation_model_dqrm_tpu.data.criteo import (
            global_shuffle_days,
        )

        paths = self._build(tmp_path)
        global_shuffle_days(paths, seed=2, rows_per_bucket=100)
        assert glob.glob(str(tmp_path / "proc" / "_shuf_bucket_*")) == []
        assert glob.glob(str(tmp_path / "proc" / "*.shuftmp*")) == []

    def test_cli_total_randomize_shuffles_on_preprocess(self, tmp_path):
        from deep_quantized_recommendation_model_dqrm_tpu.train import run

        raw = write_raw(str(tmp_path / "raw.txt"), 800, seed=5)
        out = str(tmp_path / "proc")
        argv = [
            "--data-generation=dataset",
            f"--raw-data-file={raw}",
            f"--processed-data-dir={out}",
            "--data-randomize=total",
            "--arch-sparse-feature-size=8",
            "--arch-mlp-bot=13-16-8",
            "--arch-mlp-top=16-1",
            "--mini-batch-size=40",
            "--test-mini-batch-size=10",
            "--num-batches=4",
            "--print-freq=2",
            "--test-freq=2",
        ]
        m = run(argv)
        assert np.isfinite(m["roc_auc"])
