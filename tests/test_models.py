"""Model tests: ecc_conv oracle + padding invariance, PointNet masking,
GRUCellEx formula check, full SpgModel forward."""
import jax
import jax.numpy as jnp
import numpy as np

from superpoint_graph_tpu.data.synthetic import random_spg_batch
from superpoint_graph_tpu.models import (
    GRUCellEx,
    PointNet,
    SpgModel,
    ecc_conv,
)


class TestEccConv:
    def _oracle(self, h, w, src, tgt, mask, n):
        out = np.zeros((n, w.shape[-1] if w.ndim == 3 else h.shape[1]))
        cnt = np.zeros(n)
        for e in range(len(src)):
            if not mask[e]:
                continue
            m = h[src[e]] @ w[e] if w.ndim == 3 else h[src[e]] * w[e]
            out[tgt[e]] += m
            cnt[tgt[e]] += 1
        return out / np.maximum(cnt, 1)[:, None]

    def test_vector_mode(self, rng):
        n, e, c = 10, 30, 8
        h = rng.randn(n, c).astype(np.float32)
        w = rng.randn(e, c).astype(np.float32)
        src = rng.randint(0, n, e)
        tgt = rng.randint(0, n, e)
        mask = rng.rand(e) > 0.3
        got = np.asarray(
            ecc_conv(jnp.asarray(h), jnp.asarray(w), jnp.asarray(src),
                     jnp.asarray(tgt), jnp.asarray(mask), n)
        )
        np.testing.assert_allclose(got, self._oracle(h, w, src, tgt, mask, n), rtol=1e-4, atol=1e-5)

    def test_matrix_mode(self, rng):
        n, e, c = 7, 20, 6
        h = rng.randn(n, c).astype(np.float32)
        w = rng.randn(e, c, c).astype(np.float32)
        src = rng.randint(0, n, e)
        tgt = rng.randint(0, n, e)
        mask = np.ones(e, bool)
        got = np.asarray(
            ecc_conv(jnp.asarray(h), jnp.asarray(w), jnp.asarray(src),
                     jnp.asarray(tgt), jnp.asarray(mask), n)
        )
        np.testing.assert_allclose(got, self._oracle(h, w, src, tgt, mask, n), rtol=1e-3, atol=1e-4)

    def test_isolated_node_zero(self, rng):
        h = rng.randn(4, 3).astype(np.float32)
        w = rng.randn(2, 3).astype(np.float32)
        got = np.asarray(
            ecc_conv(jnp.asarray(h), jnp.asarray(w), jnp.asarray([0, 1]),
                     jnp.asarray([1, 0]), jnp.asarray([True, True]), 4)
        )
        np.testing.assert_allclose(got[2:], 0.0)

    def test_padding_invariance(self, rng):
        """Extra masked edges must not change outputs — the moral equivalent of
        the reference's edge_mem_limit shard-consistency test."""
        n, e, c = 12, 40, 8
        h = rng.randn(n, c).astype(np.float32)
        w = rng.randn(e, c).astype(np.float32)
        src = rng.randint(0, n, e).astype(np.int32)
        tgt = rng.randint(0, n, e).astype(np.int32)
        base = ecc_conv(jnp.asarray(h), jnp.asarray(w), jnp.asarray(src),
                        jnp.asarray(tgt), jnp.ones(e, bool), n)
        pad = 25
        w2 = np.concatenate([w, rng.randn(pad, c).astype(np.float32)])
        src2 = np.concatenate([src, rng.randint(0, n, pad).astype(np.int32)])
        tgt2 = np.concatenate([tgt, rng.randint(0, n, pad).astype(np.int32)])
        mask2 = np.concatenate([np.ones(e, bool), np.zeros(pad, bool)])
        padded = ecc_conv(jnp.asarray(h), jnp.asarray(w2), jnp.asarray(src2),
                          jnp.asarray(tgt2), jnp.asarray(mask2), n)
        np.testing.assert_allclose(np.asarray(base), np.asarray(padded), rtol=1e-6)


class TestGRUCellEx:
    def test_matches_reference_formulas(self, rng):
        hs = 16
        cell = GRUCellEx(hs, layernorm=True, ingate=True)
        x = jnp.asarray(rng.randn(5, hs).astype(np.float32))
        h = jnp.asarray(rng.randn(5, hs).astype(np.float32))
        params = cell.init(jax.random.PRNGKey(0), x, h)
        y = cell.apply(params, x, h)

        p = jax.tree.map(np.asarray, params["params"])
        xin = np.asarray(x) * (1 / (1 + np.exp(-(np.asarray(h) @ p["ig"]["kernel"] + p["ig"]["bias"]))))
        gi = xin @ p["ih"]["kernel"]
        gh = np.asarray(h) @ p["hh"]["kernel"]

        def inorm(a):
            return (a - a.mean(-1, keepdims=True)) / np.sqrt(a.var(-1, keepdims=True) + 1e-5)

        gi, gh = inorm(gi), inorm(gh)
        bih, bhh = p["bias_ih"], p["bias_hh"]
        i_r, i_z, i_n = np.split(gi, 3, 1)
        h_r, h_z, h_n = np.split(gh, 3, 1)
        b_ir, b_iz, b_in = np.split(bih, 3)
        b_hr, b_hz, b_hn = np.split(bhh, 3)
        sig = lambda v: 1 / (1 + np.exp(-v))
        r = sig(i_r + b_ir + h_r + b_hr)
        z = sig(i_z + b_iz + h_z + b_hz)
        ng = np.tanh(i_n + b_in + r * (h_n + b_hn))
        want = ng + z * (np.asarray(h) - ng)
        # XLA's default (bf16-class) matmul passes put ~1e-2 absolute noise on
        # the gate pre-activations; the check is structural, not bit-exact.
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-2)


class TestPointNet:
    def _ptn(self):
        return PointNet(
            nf_conv=(32, 64), nf_fc=(64, 16), nf_conv_stn=(16, 32),
            nf_fc_stn=(32, 16), nfeat=11, nfeat_stn=11, prelast_do=0.0,
        )

    def test_shapes_and_masking(self, rng):
        ptn = self._ptn()
        clouds = jnp.asarray(rng.randn(10, 32, 11).astype(np.float32))
        glob = jnp.asarray(rng.rand(10, 1).astype(np.float32))
        mask = jnp.asarray(np.array([True] * 7 + [False] * 3))
        params = ptn.init(jax.random.PRNGKey(0), clouds, glob, mask, train=False)
        out = ptn.apply(params, clouds, glob, mask, train=False)
        assert out.shape == (10, 16)
        np.testing.assert_allclose(np.asarray(out)[7:], 0.0)

    def test_batchnorm_mask_invariance(self, rng):
        """Changing *masked* rows must not change valid outputs in train mode."""
        ptn = self._ptn()
        clouds = rng.randn(8, 16, 11).astype(np.float32)
        glob = rng.rand(8, 1).astype(np.float32)
        mask = np.array([True] * 5 + [False] * 3)
        c1 = jnp.asarray(clouds)
        c2 = clouds.copy()
        c2[5:] = 999.0
        c2 = jnp.asarray(c2)
        params = ptn.init(jax.random.PRNGKey(0), c1, jnp.asarray(glob), jnp.asarray(mask))
        o1, _ = ptn.apply(params, c1, jnp.asarray(glob), jnp.asarray(mask),
                          train=True, mutable=["batch_stats"])
        o2, _ = ptn.apply(params, c2, jnp.asarray(glob), jnp.asarray(mask),
                          train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(o1)[:5], np.asarray(o2)[:5], rtol=1e-5, atol=1e-5)


class TestSpgModel:
    def test_forward(self, rng):
        batch = random_spg_batch(rng)
        model = SpgModel(
            n_classes=6,
            model_config="gru_3_0,f_6",
            ptn_widths=((32, 64), (64, 32)),
            ptn_widths_stn=((16, 32), (32, 16)),
            fnet_widths=(13, 16, 32),
        )
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        logits = model.apply(variables, batch, train=False)
        assert logits.shape == (40, 6)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_cat_all_dims(self, rng):
        batch = random_spg_batch(rng)
        # gru_2 with cat_all (default) -> classifier sees 32*(2+1)
        model = SpgModel(
            n_classes=6,
            model_config="gru_2,f_6",
            ptn_widths=((32, 64), (64, 32)),
            ptn_widths_stn=((16, 32), (32, 16)),
            fnet_widths=(13, 16, 32),
        )
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        logits = model.apply(variables, batch, train=False)
        assert logits.shape == (40, 6)


class TestEccAttention:
    def test_softmax_normalization(self, rng):
        n, e, c = 8, 20, 5
        h = rng.randn(n, c).astype(np.float32)
        w = rng.randn(e, c).astype(np.float32)
        src = rng.randint(0, n, e).astype(np.int32)
        tgt = rng.randint(0, n, e).astype(np.int32)
        mask = np.ones(e, bool)
        out = np.asarray(
            ecc_conv(jnp.asarray(h), jnp.asarray(w), jnp.asarray(src),
                     jnp.asarray(tgt), jnp.asarray(mask), n, attention=True)
        )
        assert np.all(np.isfinite(out))
        # attention weights per (target, channel) sum to 1: message equals a
        # convex combination of incoming h[src]*1 contributions scaled by mean
        assert out.shape == (n, c)


class TestCrfConfig:
    def test_crf_network_runs(self, rng):
        from superpoint_graph_tpu.data.synthetic import random_spg_batch
        from superpoint_graph_tpu.models import SpgModel

        batch = random_spg_batch(rng)
        model = SpgModel(
            n_classes=6,
            model_config="f_6,crf_2",
            ptn_widths=((16, 32), (32, 16)),
            ptn_widths_stn=((8, 16), (16, 8)),
            fnet_widths=(13, 16, 16),
        )
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        logits = model.apply(variables, batch, train=False)
        assert logits.shape == (40, 6)
        assert np.all(np.isfinite(np.asarray(logits)))


class TestModelPaddingInvariance:
    def test_eval_logits_invariant_to_padding(self, rng):
        """Growing the padded capacities must not change valid nodes' logits
        (eval mode) — the whole-model analogue of the reference's
        edge_mem_limit shard-consistency test."""
        model = SpgModel(
            n_classes=6,
            model_config="gru_2_0,f_6",
            ptn_widths=((16, 32), (32, 16)),
            ptn_widths_stn=((8, 16), (16, 8)),
            fnet_widths=(13, 16, 16),
        )
        b1 = random_spg_batch(np.random.RandomState(4), n_sp=20, n_sp_pad=24,
                              n_edges=50, n_edges_pad=64)
        variables = model.init(jax.random.PRNGKey(0), b1, train=False)
        out1 = np.asarray(model.apply(variables, b1, train=False))[:20]

        # same real content, bigger padding
        import jax.numpy as jnp

        def grow(x, rows, fill=0):
            pad = [(0, rows - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad, constant_values=fill)

        b2 = b1.replace(
            clouds=grow(b1.clouds, 40),
            clouds_global=grow(b1.clouds_global, 40),
            cloud_mask=grow(b1.cloud_mask, 40),
            node_mask=grow(b1.node_mask, 40),
            targets=grow(b1.targets, 40, fill=-100),
            target_size=grow(b1.target_size, 40),
            src=grow(b1.src, 96),
            tgt=grow(b1.tgt, 96),
            edge_feats=grow(b1.edge_feats, 96),
            edge_mask=grow(b1.edge_mask, 96),
        )
        out2 = np.asarray(model.apply(variables, b2, train=False))[:20]
        np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


class TestEdgeFeatureCompaction:
    def _model(self):
        return SpgModel(
            n_classes=6,
            model_config="gru_2_0,f_6",  # matrix-mode filters: compaction's payoff
            ptn_widths=((16, 32), (32, 16)),
            ptn_widths_stn=((8, 16), (16, 8)),
            fnet_widths=(13, 16, 16),
        )

    def test_compacted_equals_plain(self, rng):
        """fnet-per-unique-row + gather must produce identical eval logits to
        fnet-per-edge (reference ecc/utils.py:44-48 unique_rows/idxe)."""
        batch = random_spg_batch(rng)
        # plant duplicate edge-feature rows (the real SPGs are full of them)
        ef = np.array(batch.edge_feats)
        ef[10:30] = ef[0]
        ef[30:45] = ef[1]
        batch = batch.replace(edge_feats=jnp.asarray(ef))

        uniq_rows, inv = np.unique(ef, axis=0, return_inverse=True)
        cap = 64
        uniq = np.zeros((cap, ef.shape[1]), np.float32)
        uniq[: len(uniq_rows)] = uniq_rows
        umask = np.zeros(cap, bool)
        umask[: len(uniq_rows)] = True
        compact = batch.replace(
            edge_feat_uniq=jnp.asarray(uniq),
            edge_feat_idx=jnp.asarray(inv.astype(np.int32)),
            edge_uniq_mask=jnp.asarray(umask),
        )
        model = self._model()
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        plain = np.asarray(model.apply(variables, batch, train=False))
        got = np.asarray(model.apply(variables, compact, train=False))
        np.testing.assert_allclose(got, plain, rtol=1e-5, atol=1e-5)

    def test_collate_emits_compaction(self, rng):
        from superpoint_graph_tpu.data.loader import (
            LoaderConfig, collate_spg,
        )

        n_sp, n_ed = 12, 40
        ef = rng.rand(n_ed, 13).astype(np.float32)
        ef[5:] = ef[0]  # heavy duplication
        sample = {
            "node_gt": rng.randint(0, 6, (n_sp, 1)),
            "node_gt_size": rng.randint(0, 5, (n_sp, 7)),
            "edges": rng.randint(0, n_sp, (n_ed, 2)),
            "edge_feats": ef,
            "clouds": rng.randn(n_sp, 16, 11).astype(np.float32),
            "clouds_global": rng.rand(n_sp).astype(np.float32),
            "cloud_flag": np.zeros(n_sp, np.int32),
        }
        cfg = LoaderConfig(ptn_npts=16, n_sp_bucket=16, n_edge_bucket=64,
                           n_uniq_bucket=16)
        b = collate_spg([sample], cfg, 6, 11)
        assert b.edge_feat_uniq is not None
        assert b.edge_feat_uniq.shape[0] == 16  # 6 unique rows -> one bucket
        # idx maps every real edge back to its own feature row
        uniq = np.asarray(b.edge_feat_uniq)
        idx = np.asarray(b.edge_feat_idx)
        np.testing.assert_allclose(
            uniq[idx[:n_ed]], np.asarray(b.edge_feats)[:n_ed], atol=1e-6
        )
        # compaction skipped when it wouldn't shrink the fnet input
        cfg2 = LoaderConfig(ptn_npts=16, n_sp_bucket=16, n_edge_bucket=64,
                            n_uniq_bucket=0)
        b2 = collate_spg([sample], cfg2, 6, 11)
        assert b2.edge_feat_uniq is None


class TestMoreConfigs:
    def test_lstm_and_bn_dropout_tokens(self, rng):
        batch = random_spg_batch(rng)
        model = SpgModel(
            n_classes=6,
            model_config="lstm_2,b,r,d_0.3,f_6",
            ptn_widths=((16, 32), (32, 16)),
            ptn_widths_stn=((8, 16), (16, 8)),
            fnet_widths=(13, 16, 16),
        )
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        logits = model.apply(variables, batch, train=False)
        assert logits.shape == (40, 6)
        assert np.all(np.isfinite(np.asarray(logits)))
        # train mode with dropout rng
        out, _ = model.apply(variables, batch, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.all(np.isfinite(np.asarray(out)))

    def test_sgd_momentum_trains(self, rng):
        from superpoint_graph_tpu.learn.train import Trainer

        batch = random_spg_batch(rng)
        model = SpgModel(
            n_classes=6, model_config="gru_2,f_6",
            ptn_widths=((16, 32), (32, 16)),
            ptn_widths_stn=((8, 16), (16, 8)),
            fnet_widths=(13, 16, 16),
        )
        trainer = Trainer(model, optim="sgd", lr=1e-2, momentum=0.9,
                          wd=1e-4, checkpoint_ptn=False)
        state = trainer.init(jax.random.PRNGKey(0), batch)
        l0 = None
        for i in range(8):
            state, loss, _ = trainer.train_step(state, batch, jax.random.PRNGKey(i))
            l0 = l0 or float(loss)
        assert float(loss) < l0


class TestEccGradcheck:
    def test_finite_difference_gradient(self, rng):
        """float64 finite-difference gradcheck of ecc_conv — the reference's
        core op test (test_GraphConvModule.py:23-57), with autodiff instead of
        a hand-written backward."""
        import jax

        with jax.enable_x64(True):
            n, e, c = 6, 14, 4
            h = jnp.asarray(rng.randn(n, c))
            w = jnp.asarray(rng.randn(e, c))
            src = jnp.asarray(rng.randint(0, n, e))
            tgt = jnp.asarray(rng.randint(0, n, e))
            mask = jnp.asarray(rng.rand(e) > 0.2)
            cot = jnp.asarray(rng.randn(n, c))

            def loss_h(hh):
                return jnp.sum(ecc_conv(hh, w, src, tgt, mask, n) * cot)

            def loss_w(ww):
                return jnp.sum(ecc_conv(h, ww, src, tgt, mask, n) * cot)

            for fn, x in ((loss_h, h), (loss_w, w)):
                g = jax.grad(fn)(x)
                eps = 1e-6
                flat = np.asarray(x).ravel()
                for idx in rng.choice(flat.size, 10, replace=False):
                    d = np.zeros_like(flat)
                    d[idx] = eps
                    dd = jnp.asarray(d.reshape(np.asarray(x).shape))
                    num = (float(fn(x + dd)) - float(fn(x - dd))) / (2 * eps)
                    np.testing.assert_allclose(
                        num, float(np.asarray(g).ravel()[idx]), rtol=1e-5, atol=1e-7
                    )
