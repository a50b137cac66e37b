"""CNN model family + top-k row-sparsified gradient sync.

Covers the TPU analogue of training_imagenet_speedup.py: quantized CNN
forward/loss (models/cnn.py), the round-robin top-k selective all-reduce
with local-SGD drift on unselected rows (parallel/topk_grad.py:120-232
semantics), its compressed gather mode, and the k schedule.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_quantized_recommendation_model_dqrm_tpu.models import cnn
from deep_quantized_recommendation_model_dqrm_tpu.parallel import topk_grad
from deep_quantized_recommendation_model_dqrm_tpu.parallel.mesh import make_mesh

CFG = cnn.CNNConfig(image_size=16, in_channels=2, channels=(8, 16), num_classes=4)


def _batch(rs, n=16, cfg=CFG):
    return cnn.synthetic_image_batch(cfg, n, rs)


def _loss_fn(cfg):
    def f(p, batch):
        imgs, labels = batch
        return cnn.cross_entropy_loss(cnn.cnn_forward(cfg, p, imgs, train=True), labels)

    return f


class TestCNNModel:
    def test_forward_shape_and_finite(self, rng):
        params = cnn.init_cnn_params(CFG, 0)
        imgs, labels = _batch(rng)
        logits = cnn.cnn_forward(CFG, params, imgs)
        assert logits.shape == (16, 4)
        assert bool(jnp.all(jnp.isfinite(logits)))
        loss = cnn.cross_entropy_loss(logits, jnp.asarray(labels))
        assert 0.5 < float(loss) < 5.0  # ~ln(4) at init

    def test_quantized_close_to_fp_at_8bit(self, rng):
        params = cnn.init_cnn_params(CFG, 0)
        imgs, _ = _batch(rng)
        q8 = cnn.cnn_forward(CFG, params, imgs)
        fp = cnn.cnn_forward(
            cnn.CNNConfig(image_size=16, in_channels=2, channels=(8, 16),
                          num_classes=4, quantize=False),
            params, imgs,
        )
        assert float(jnp.max(jnp.abs(q8 - fp))) < 0.1

    def test_single_chip_training_learns(self, rng):
        cfg = CFG
        params = cnn.init_cnn_params(cfg, 0)
        loss_fn = _loss_fn(cfg)

        @jax.jit
        def step(p, batch):
            loss, g = jax.value_and_grad(loss_fn)(p, batch)
            return jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, g), loss

        first = None
        for i in range(150):
            imgs, labels = _batch(rng, 32)
            params, loss = step(params, (imgs, labels))
            if first is None:
                first = float(loss)
        imgs, labels = _batch(rng, 64)
        acc = float(cnn.accuracy_topk(cnn.cnn_forward(cfg, params, imgs),
                                      jnp.asarray(labels)))
        assert float(loss) < first
        assert acc > 0.75, f"synthetic CNN task should be separable, acc={acc}"

    def test_dropout_and_no_bn_paths(self, rng):
        cfg = cnn.CNNConfig(image_size=16, in_channels=2, channels=(8,),
                            num_classes=4, batch_norm=False, dropout_rate=0.3)
        params = cnn.init_cnn_params(cfg, 0)
        imgs, _ = _batch(rng, 8, cfg)
        out = cnn.cnn_forward(cfg, params, imgs, train=True,
                              dropout_key=jax.random.PRNGKey(0))
        assert out.shape == (8, 4) and bool(jnp.all(jnp.isfinite(out)))


class TestTopKStep:
    def _mesh(self, n=4):
        return make_mesh(n, axis_name="dp")

    def _dense_reference(self, cfg, params, batches, lr, wd, mesh):
        """Plain dense-sync DP SGD (average_gradients, :230-236)."""
        loss_fn = _loss_fn(cfg)

        @jax.jit
        def step(p, batch):
            # global batch == concatenation of shards; dense DP mean grad
            # equals the full-batch grad only when shard losses are equal-
            # weighted, which holds here (equal shard sizes, mean loss).
            def mean_loss(pp):
                imgs, labels = batch
                n = mesh.devices.size
                per = imgs.shape[0] // n
                losses = [
                    loss_fn(pp, (imgs[i * per:(i + 1) * per],
                                 labels[i * per:(i + 1) * per]))
                    for i in range(n)
                ]
                return jnp.mean(jnp.stack(losses))

            g = jax.grad(mean_loss)(p)
            return jax.tree_util.tree_map(lambda a, b: a - lr * (b + wd * a), p, g)

        for b in batches:
            params = step(params, b)
        return params

    @pytest.mark.parametrize("mode", ["mask", "gather"])
    def test_full_k_matches_dense_dp(self, rng, mode):
        """top_k >= total rows -> every row synced every step == dense DP."""
        cfg = CFG
        mesh = self._mesh(4)
        params = cnn.init_cnn_params(cfg, 0)
        R = topk_grad.total_rows(params)
        lr, wd = 0.05, 0.01
        step = topk_grad.make_topk_dp_train_step(
            _loss_fn(cfg), mesh, R, lr, wd, mode=mode,
            batch_spec=(jax.sharding.PartitionSpec("dp"),
                        jax.sharding.PartitionSpec("dp")),
        )
        state = topk_grad.init_topk_state(params, 4)
        batches = [_batch(rng, 32) for _ in range(3)]
        for b in batches:
            state, (loss, mb) = step(state, b)
        ref = self._dense_reference(cfg, cnn.init_cnn_params(cfg, 0),
                                    batches, lr, wd, mesh)
        for got, want in zip(jax.tree_util.tree_leaves(state.params),
                             jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=2e-4)

    def test_partial_k_drifts_then_syncs_selected(self, rng):
        """With small k, unselected rows drift (local SGD) while 1-D params
        stay identical across replicas; synced volume < full volume."""
        cfg = CFG
        mesh = self._mesh(4)
        params = cnn.init_cnn_params(cfg, 0)
        R = topk_grad.total_rows(params)
        step = topk_grad.make_topk_dp_train_step(
            _loss_fn(cfg), mesh, max(1, R // 8), 0.05, mode="mask",
            batch_spec=(jax.sharding.PartitionSpec("dp"),
                        jax.sharding.PartitionSpec("dp")),
        )
        state = topk_grad.init_topk_state(params, 4)
        mb_full = sum(l.size for l in jax.tree_util.tree_leaves(params)) / 1e6
        for _ in range(5):
            state, (loss, mb) = step(state, _batch(rng, 32))
        assert float(mb) < mb_full
        # Per-device values: fetch each device's copy of a conv kernel.
        w = state.params["conv"][0]["w"]
        shards = [np.asarray(s.data) for s in w.addressable_shards]
        assert len(shards) == 4
        drift = max(np.max(np.abs(shards[0] - s)) for s in shards[1:])
        assert drift > 0.0, "unselected rows should drift across replicas"
        b = state.params["conv"][0]["b"]
        bsh = [np.asarray(s.data) for s in b.addressable_shards]
        for s in bsh[1:]:
            np.testing.assert_array_equal(bsh[0], s)

    def test_scores_refresh_round_robin(self, rng):
        """state.scores refreshes only every `world` steps."""
        cfg = CFG
        mesh = self._mesh(4)
        params = cnn.init_cnn_params(cfg, 0)
        step = topk_grad.make_topk_dp_train_step(
            _loss_fn(cfg), mesh, 4, 0.05,
            batch_spec=(jax.sharding.PartitionSpec("dp"),
                        jax.sharding.PartitionSpec("dp")),
        )
        state = topk_grad.init_topk_state(params, 4)
        state, _ = step(state, _batch(rng, 32))  # step 0: refresh
        s0 = np.asarray(state.scores)
        assert np.any(s0 != 0)
        state, _ = step(state, _batch(rng, 32))  # step 1: hold
        np.testing.assert_array_equal(s0, np.asarray(state.scores))
        state, _ = step(state, _batch(rng, 32))  # 2: hold
        state, _ = step(state, _batch(rng, 32))  # 3: hold
        state, _ = step(state, _batch(rng, 32))  # 4: refresh
        assert np.any(np.asarray(state.scores) != s0)

    def test_gather_mode_syncs_fewer_bytes(self, rng):
        cfg = CFG
        mesh = self._mesh(4)
        R = topk_grad.total_rows(cnn.init_cnn_params(cfg, 0))
        k = max(1, R // 4)
        outs = {}
        for mode in ("mask", "gather"):
            # fresh params per mode: the step donates its state buffers
            params = cnn.init_cnn_params(cfg, 0)
            batch_rs = np.random.RandomState(7)
            step = topk_grad.make_topk_dp_train_step(
                _loss_fn(cfg), mesh, k, 0.05, mode=mode,
                batch_spec=(jax.sharding.PartitionSpec("dp"),
                            jax.sharding.PartitionSpec("dp")),
            )
            state = topk_grad.init_topk_state(params, 4)
            state, (loss, mb) = step(state, _batch(batch_rs, 32))
            outs[mode] = (float(loss), float(mb))
        # Same loss (forward identical); gather-mode volume is the static
        # per-layer budget, close to (within 2x of) the mask-mode volume.
        assert outs["mask"][0] == pytest.approx(outs["gather"][0], rel=1e-5)
        assert outs["gather"][1] <= outs["mask"][1] * 2.0

    def test_estimate_row_trace_exact_on_diagonal_hessian(self):
        """For a quadratic loss 0.5*sum(a_ij p_ij^2) the Hessian is diagonal
        and Rademacher Hutchinson is EXACT (v*Hv = v^2*a = a): per-row trace
        must equal sum_j a_ij regardless of sample count."""
        a = jnp.arange(12.0).reshape(3, 4) + 1.0
        params = {"w": jnp.ones((3, 4)), "b": jnp.ones((3,))}

        def loss_fn(p, batch):
            return 0.5 * jnp.sum(a * p["w"] ** 2) + jnp.sum(p["b"] ** 2)

        tr = topk_grad.estimate_row_trace(loss_fn, params, None, n_samples=2,
                                          normalize=False)
        assert len(tr) == 1  # only the 2-D leaf
        np.testing.assert_allclose(np.asarray(tr[0]), np.asarray(jnp.sum(a, axis=1)),
                                   rtol=1e-6)
        # normalized form: t / (2*numel/rows) + 1 (:496-500)
        trn = topk_grad.estimate_row_trace(loss_fn, params, None, n_samples=2)
        np.testing.assert_allclose(
            np.asarray(trn[0]),
            np.asarray(jnp.sum(a, axis=1)) / (2.0 * 12 / 3) + 1.0, rtol=1e-6)

    def test_trace_weighted_step_runs(self, rng):
        cfg = CFG
        mesh = self._mesh(4)
        params = cnn.init_cnn_params(cfg, 0)
        imgs, labels = _batch(rng, 32)
        trace = topk_grad.estimate_row_trace(
            _loss_fn(cfg), params, (imgs, labels), n_samples=2)
        step = topk_grad.make_topk_dp_train_step(
            _loss_fn(cfg), mesh, 8, 0.05, trace=trace,
            batch_spec=(jax.sharding.PartitionSpec("dp"),
                        jax.sharding.PartitionSpec("dp")),
        )
        state = topk_grad.init_topk_state(params, 4)
        state, (loss, mb) = step(state, _batch(rng, 32))
        assert np.isfinite(float(loss))

    def test_trace_weighting_changes_row_selection(self):
        """The point of `--metric hessian`: rows with small gradients but
        high curvature outrank flat high-gradient rows. Construct a loss
        whose grad-norm top-1 row differs from the trace-weighted top-1."""
        g = jnp.asarray([3.0, 2.0, 1.0, 0.1])  # per-row gradient magnitudes
        c = jnp.asarray([0.0, 0.0, 50.0, 0.0])  # curvature on row 2 only
        params = {"w": jnp.zeros((4, 2))}

        def loss_fn(p, batch):
            rowsum = jnp.sum(p["w"], axis=1)
            return jnp.sum(g * rowsum) + 0.5 * jnp.sum(c * rowsum**2)

        grads = jax.grad(lambda p: loss_fn(p, None))(params)
        trace = topk_grad.estimate_row_trace(loss_fn, params, None, n_samples=4)
        plain = topk_grad._row_scores(grads["w"], None)
        weighted = topk_grad._row_scores(grads["w"], trace[0])
        assert int(jnp.argmax(plain)) == 0  # grad-norm picks the steep row
        assert int(jnp.argmax(weighted)) == 2  # curvature flips the pick
        # and through lax.top_k, the selected row sets differ
        _, top_p = jax.lax.top_k(plain, 1)
        _, top_w = jax.lax.top_k(weighted, 1)
        assert int(top_p[0]) != int(top_w[0])

    def test_get_k_value_schedule(self):
        assert topk_grad.get_k_value(8, 0, 200, "cifar10") == 8
        assert topk_grad.get_k_value(8, 61, 200, "cifar10") == 16
        assert topk_grad.get_k_value(8, 121, 200, "cifar10") == 32
        assert topk_grad.get_k_value(8, 151, 200, "cifar10") == 64
        assert topk_grad.get_k_value(8, 31, 90, "imagenet") == 16
        assert topk_grad.get_k_value(8, 61, 90, "imagenet") == 32
        assert topk_grad.get_k_value(8, 10, 90, "other") == 8


class TestCNNCLI:
    def test_cli_e2e(self, capsys):
        from deep_quantized_recommendation_model_dqrm_tpu import train_cnn

        rc = train_cnn.main([
            "--arch=8-16", "--image-size=16", "--num-classes=4",
            "--batch-size=32", "--steps=6", "--steps-per-epoch=3",
            "--top-k=8", "--mode=gather", "--print-freq=3",
            "--k-schedule=cifar10", "--num-devices=4",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "final:" in out and "synced" in out

    def test_cli_hessian_metric(self, capsys):
        """--metric hessian needs NO external inputs: the per-row trace is
        estimated on-device each epoch (Hutchinson double-backward,
        topk_grad.estimate_row_trace; reference precomputes via pyhessian,
        training_imagenet_speedup.py:474-500)."""
        from deep_quantized_recommendation_model_dqrm_tpu import train_cnn

        rc = train_cnn.main([
            "--arch=8-16", "--image-size=16", "--num-classes=4",
            "--batch-size=32", "--steps=4", "--steps-per-epoch=2",
            "--top-k=8", "--print-freq=2", "--num-devices=4",
            "--metric=hessian", "--hessian-samples=2",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "final:" in out
