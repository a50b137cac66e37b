"""Criteo dataset pipeline: raw TSV preprocessing, per-day npz, splits,
batch iteration.

Re-designed from the reference's `data_utils.py` (1292 LoC) +
`dlrm_data_pytorch.py` CriteoDataset (:50-325):

- raw text -> per-day arrays (`preprocess_criteo`): split the 7-day Kaggle
  `train.txt` (or 24-day Terabyte files) into days, build per-column
  categorical dictionaries, optionally sub-sample zero-label rows
  (data_utils.py:876-1290). A native C++ fast path (native/criteo_preprocess
  .cpp, loaded via ctypes) replaces the reference's Cython-compiled copy of
  data_utils (cython/cython_compile.py:14-26); numpy is the fallback.
- `CriteoDataset`: train = days 0..n-2, val/test = first/second half of the
  last day (dlrm_data_pytorch.py:227-259); `%max_ind_range` hashing at
  access (:290-295); `X_int -> log1p` transform (collate_wrapper_criteo,
  :328-345).
- batches come out in this framework's static layout: dense [B,13] f32
  (log1p), indices [26, B, 1] int32, labels [B] f32.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from deep_quantized_recommendation_model_dqrm_tpu.models.dlrm import Batch

NUM_DENSE = 13
NUM_SPARSE = 26


def _parse_lines_numpy(
    lines: List[bytes],
    dicts: Optional[List[Dict[int, int]]],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse raw Criteo TSV lines: label, 13 ints (blank=0), 26 hex cats.

    With `dicts`, categorical values are mapped through per-column
    dictionaries built on the fly (the reference's convertUStringToDistinctInts
    / process_one_file dict build, data_utils.py:967-1080). Without, raw
    int64 hex values are returned for later hashing.
    """
    n = len(lines)
    y = np.zeros(n, np.int32)
    xi = np.zeros((n, NUM_DENSE), np.int32)
    xc = np.zeros((n, NUM_SPARSE), np.int64)
    for r, line in enumerate(lines):
        parts = line.rstrip(b"\n").split(b"\t")
        parts += [b""] * (1 + NUM_DENSE + NUM_SPARSE - len(parts))
        y[r] = int(parts[0] or b"0")
        for j in range(NUM_DENSE):
            v = parts[1 + j]
            xi[r, j] = int(v) if v else 0
        for j in range(NUM_SPARSE):
            v = parts[1 + NUM_DENSE + j]
            raw = int(v, 16) if v else 0
            if dicts is not None:
                d = dicts[j]
                idx = d.get(raw)
                if idx is None:
                    idx = len(d)
                    d[raw] = idx
                xc[r, j] = idx
            else:
                xc[r, j] = raw
    return y, xi, xc


def _native_parser():
    try:
        from deep_quantized_recommendation_model_dqrm_tpu.data import native_ext

        return native_ext if native_ext.available() else None
    except Exception:
        return None


def preprocess_criteo(
    raw_path: str,
    out_dir: str,
    num_days: int = 7,
    sub_sample_rate: float = 0.0,
    seed: int = 123,
    use_native: bool = True,
    max_rows: Optional[int] = None,
) -> List[str]:
    """Split raw TSV into days, build dictionaries, write per-day npz.

    Mirrors `getCriteoAdData` (data_utils.py:876): rows are dealt to days
    round-robin by line count (the Kaggle file has no timestamps; the
    reference splits by offset chunks — we match chunk semantics), zero-label
    rows dropped with probability (1 - sub_sample_rate kept)
    (data_utils.py:1021-1031). Returns per-day npz paths with keys
    y / X_int / X_cat plus a counts file (`_fea_count.npz` analogue).
    """
    os.makedirs(out_dir, exist_ok=True)
    with open(raw_path, "rb") as f:
        lines = f.readlines()
    if max_rows:
        lines = lines[:max_rows]
    total = len(lines)
    per_day = (total + num_days - 1) // num_days
    rng = np.random.RandomState(seed)
    native = _native_parser() if use_native else None

    dicts: List[Dict[int, int]] = [dict() for _ in range(NUM_SPARSE)]
    paths = []
    for day in range(num_days):
        chunk = lines[day * per_day : (day + 1) * per_day]
        if not chunk:
            chunk = []
        if native is not None:
            y, xi, xc_raw = native.parse_lines(chunk)
            xc = np.zeros_like(xc_raw)
            for j in range(NUM_SPARSE):
                col = xc_raw[:, j]
                d = dicts[j]
                out = np.empty(col.shape, np.int64)
                for r, raw in enumerate(col):
                    idx = d.get(int(raw))
                    if idx is None:
                        idx = len(d)
                        d[int(raw)] = idx
                    out[r] = idx
                xc[:, j] = out
        else:
            y, xi, xc = _parse_lines_numpy(chunk, dicts)
        if sub_sample_rate > 0.0:
            keep = (y == 1) | (rng.rand(len(y)) > sub_sample_rate)
            y, xi, xc = y[keep], xi[keep], xc[keep]
        path = os.path.join(out_dir, f"day_{day}.npz")
        np.savez_compressed(path, y=y, X_int=xi, X_cat=xc.astype(np.int64))
        paths.append(path)
    counts = np.array([max(len(d), 1) for d in dicts], np.int64)
    np.savez(os.path.join(out_dir, "counts.npz"), counts=counts)
    return paths


def preprocess_criteo_days(
    raw_day_paths: List[str],
    out_dir: str,
    sub_sample_rate: float = 0.0,
    seed: int = 123,
    use_native: bool = True,
) -> List[str]:
    """Terabyte-style preprocessing: ONE RAW FILE PER DAY (the Terabyte
    dataset ships day_0 ... day_23 as separate files; data_utils.py:876
    iterates `days` files). Shares the Kaggle path's dictionary build across
    days; day k's npz is built from raw_day_paths[k].
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    native = _native_parser() if use_native else None
    dicts: List[Dict[int, int]] = [dict() for _ in range(NUM_SPARSE)]
    paths = []
    for day, rp in enumerate(raw_day_paths):
        with open(rp, "rb") as f:
            chunk = f.readlines()
        if native is not None:
            y, xi, xc_raw = native.parse_lines(chunk)
            xc = np.zeros_like(xc_raw)
            for j in range(NUM_SPARSE):
                d = dicts[j]
                out = np.empty(len(chunk), np.int64)
                for r, raw in enumerate(xc_raw[:, j]):
                    idx = d.get(int(raw))
                    if idx is None:
                        idx = len(d)
                        d[int(raw)] = idx
                    out[r] = idx
                xc[:, j] = out
        else:
            y, xi, xc = _parse_lines_numpy(chunk, dicts)
        if sub_sample_rate > 0.0:
            keep = (y == 1) | (rng.rand(len(y)) > sub_sample_rate)
            y, xi, xc = y[keep], xi[keep], xc[keep]
        path = os.path.join(out_dir, f"day_{day}.npz")
        np.savez_compressed(path, y=y, X_int=xi, X_cat=xc.astype(np.int64))
        paths.append(path)
    counts = np.array([max(len(d), 1) for d in dicts], np.int64)
    np.savez(os.path.join(out_dir, "counts.npz"), counts=counts)
    return paths


class CriteoDataset:
    """Preprocessed Criteo days with the reference's split semantics.

    split: "train" = days 0..n-2; "val" = first half of last day; "test" =
    second half (dlrm_data_pytorch.py:227-259). Loads day arrays lazily and
    keeps at most one day resident (memory-map mode analogue, :272-295).
    """

    def __init__(
        self,
        data_dir: str,
        split: str = "train",
        max_ind_range: int = -1,
        num_days: Optional[int] = None,
    ):
        self.data_dir = data_dir
        self.split = split
        self.max_ind_range = max_ind_range
        # Sort numerically by day index: lexicographic order would put
        # day_10 before day_2 once >=10 days exist (Terabyte day_0..day_23),
        # silently corrupting the temporal ordering and the last-day
        # val/test split.
        days = sorted(
            (
                f for f in os.listdir(data_dir)
                if f.startswith("day_") and f.endswith(".npz")
            ),
            key=lambda f: int(f[len("day_"):-len(".npz")]),
        )
        if num_days is not None:
            days = days[:num_days]
        if not days:
            raise FileNotFoundError(f"no day_*.npz under {data_dir}")
        self.day_paths = [os.path.join(data_dir, f) for f in days]
        counts_path = os.path.join(data_dir, "counts.npz")
        self.counts = (
            np.load(counts_path)["counts"]
            if os.path.exists(counts_path)
            else None
        )
        if max_ind_range > 0 and self.counts is not None:
            self.counts = np.minimum(self.counts, max_ind_range)
        self._cache_day = -1
        self._cache = None
        # day lengths
        self.day_lens = []
        for p in self.day_paths:
            with np.load(p) as z:
                self.day_lens.append(len(z["y"]))

    @property
    def table_sizes(self) -> Tuple[int, ...]:
        if self.counts is None:
            raise ValueError("counts.npz missing; pass explicit table sizes")
        return tuple(int(c) for c in self.counts)

    def _day_arrays(self, day: int):
        if self._cache_day != day:
            with np.load(self.day_paths[day]) as z:
                self._cache = (z["y"], z["X_int"], z["X_cat"])
            self._cache_day = day
        return self._cache

    def _split_range(self) -> List[Tuple[int, int, int]]:
        """List of (day, start, stop) covering this split."""
        n = len(self.day_paths)
        if self.split == "train":
            return [(d, 0, self.day_lens[d]) for d in range(n - 1)]
        last = n - 1
        half = self.day_lens[last] // 2
        if self.split == "val":
            return [(last, 0, half)]
        if self.split == "test":
            return [(last, half, self.day_lens[last])]
        raise ValueError(f"unknown split {self.split!r}")

    def __len__(self) -> int:
        return sum(stop - start for _, start, stop in self._split_range())

    def iter_batches(
        self,
        batch_size: int,
        drop_last: bool = True,
        shuffle_days: bool = False,
        seed: int = 0,
    ) -> Iterator[Batch]:
        """Stream batches day by day (data_loader_terabyte.py:19-172
        semantics: per-day iteration, cross-day remainder stitching)."""
        import jax.numpy as jnp

        ranges = self._split_range()
        if shuffle_days:
            rng = np.random.RandomState(seed)
            ranges = [ranges[i] for i in rng.permutation(len(ranges))]
        buf_y, buf_xi, buf_xc = [], [], []
        buffered = 0
        for day, start, stop in ranges:
            y, xi, xc = self._day_arrays(day)
            y, xi, xc = y[start:stop], xi[start:stop], xc[start:stop]
            pos = 0
            while pos < len(y):
                take = min(batch_size - buffered, len(y) - pos)
                buf_y.append(y[pos : pos + take])
                buf_xi.append(xi[pos : pos + take])
                buf_xc.append(xc[pos : pos + take])
                buffered += take
                pos += take
                if buffered == batch_size:
                    yield self._make_batch(
                        np.concatenate(buf_y),
                        np.concatenate(buf_xi),
                        np.concatenate(buf_xc),
                    )
                    buf_y, buf_xi, buf_xc = [], [], []
                    buffered = 0
        if buffered and not drop_last:
            yield self._make_batch(
                np.concatenate(buf_y), np.concatenate(buf_xi), np.concatenate(buf_xc)
            )

    def _make_batch(self, y, xi, xc) -> Batch:
        import jax.numpy as jnp

        if self.max_ind_range > 0:
            xc = xc % self.max_ind_range  # hashing at access, :290-295
        dense = np.log1p(np.maximum(xi, 0).astype(np.float32))  # log(x+1)
        indices = xc.T.astype(np.int32)[:, :, None]  # [26, B, 1]
        return Batch(
            dense=jnp.asarray(dense),
            indices=jnp.asarray(indices),
            labels=jnp.asarray(y.astype(np.float32)),
            mask=None,
        )


def batch_from_offsets(
    dense,  # [B, 13] float (raw; log1p applied here)
    lS_o,  # [T, B] int offsets per table (reference layout)
    lS_i,  # [T, total_indices] flat indices per table
    labels,  # [B]
    pooling_size: int = 1,
    apply_log1p: bool = True,
):
    """Convert the reference's offset-encoded sparse layout into this
    framework's static [T, B, P] + mask layout.

    The reference represents variable-length bags as (offsets lS_o, flat
    indices lS_i) pairs (collate_wrapper_criteo_offset,
    dlrm_data_pytorch.py:328-345); XLA needs static shapes, so bags are
    padded to `pooling_size` with a 0/1 mask. Bags longer than
    `pooling_size` are truncated (choose P >= max bag length).
    """
    import jax.numpy as jnp

    lS_o = np.asarray(lS_o)
    T, B = lS_o.shape
    P = pooling_size
    idx = np.zeros((T, B, P), np.int32)
    mask = np.zeros((T, B, P), np.float32)
    for t in range(T):
        flat = np.asarray(lS_i[t])
        ends = np.concatenate([lS_o[t, 1:], [len(flat)]])
        for b in range(B):
            seg = flat[lS_o[t, b] : ends[b]][:P]
            idx[t, b, : len(seg)] = seg
            mask[t, b, : len(seg)] = 1.0
    d = np.asarray(dense, np.float32)
    if apply_log1p:
        d = np.log1p(np.maximum(d, 0))
    return Batch(
        dense=jnp.asarray(d),
        indices=jnp.asarray(idx),
        labels=jnp.asarray(np.asarray(labels, np.float32).reshape(-1)),
        mask=jnp.asarray(mask),
    )
