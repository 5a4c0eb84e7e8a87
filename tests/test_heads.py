"""Head + MTL wiring tests on tiny shapes (fast CPU smoke of the full graph)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rscotr_tpu.models.layers.transformer import DeformableEncoder


def tiny_encoder(C=32):
    return DeformableEncoder(num_layers=2, embed_dims=C, num_heads=4,
                             num_levels=4, num_points=2,
                             feedforward_channels=64)


def make_encode_fn(enc_module):
    # in tests we bind the encoder standalone; inside MTL it is a shared child
    def outer(params):
        def fn(tokens, pos, ref, shapes, key_padding_mask=None,
               deterministic=True):
            return enc_module.apply(params, tokens, pos, ref, shapes,
                                    key_padding_mask=key_padding_mask,
                                    deterministic=deterministic)
        return fn
    return outer


@pytest.fixture(scope="module")
def rng():
    return jax.random.key(0)


def neck_feats(B=2, C=32, sizes=((16, 16), (8, 8), (4, 4), (2, 2))):
    k = jax.random.key(1)
    return tuple(jax.random.normal(jax.random.fold_in(k, i), (B, h, w, C))
                 for i, (h, w) in enumerate(sizes))


class TestClsHeads:
    def test_slvl(self, rng):
        from rscotr_tpu.models.heads import SlvlClsHead
        bb = neck_feats(sizes=((16, 16), (8, 8), (4, 4), (2, 2)))
        head = SlvlClsHead(num_classes=45, in_channels=32)
        params = head.init(rng, None, bb)
        out = head.apply(params, None, bb)
        assert out.shape == (2, 45)

    def test_mlvl_schemes(self, rng):
        from rscotr_tpu.models.heads import MlvlClsHead
        enc = tiny_encoder()
        nf = neck_feats()
        # init encoder params once on the flattened token shape
        B, C = 2, 32
        nv = sum(h * w for h, w in ((2, 2), (4, 4), (8, 8), (16, 16)))
        ek = enc.init(rng, jnp.zeros((B, nv, C)), jnp.zeros((B, nv, C)),
                      jnp.zeros((B, nv, 4, 2)),
                      ((2, 2), (4, 4), (8, 8), (16, 16)))
        encode = make_encode_fn(enc)(ek)
        for scheme in range(1, 9):
            head = MlvlClsHead(num_classes=7, scheme=scheme,
                               feat_channels=32)
            params = head.init(rng, nf, None, encode_fn=encode)
            out = head.apply(params, nf, None, encode_fn=encode)
            assert out.shape == (2, 7), f"scheme {scheme}: {out.shape}"
            assert np.isfinite(np.asarray(out)).all()


class TestMask2Former:
    def test_seg_head_shapes(self, rng):
        from rscotr_tpu.models.heads import Mask2FormerHead
        enc = tiny_encoder()
        B, C = 2, 32
        nf = neck_feats()                      # strides 8..64 equivalent
        bb = neck_feats(sizes=((32, 32), (16, 16), (8, 8), (4, 4)))
        nv = sum(h * w for h, w in ((2, 2), (4, 4), (8, 8), (16, 16)))
        ek = enc.init(rng, jnp.zeros((B, nv, C)), jnp.zeros((B, nv, C)),
                      jnp.zeros((B, nv, 4, 2)),
                      ((2, 2), (4, 4), (8, 8), (16, 16)))
        encode = make_encode_fn(enc)(ek)
        for scheme in (1, 2):
            head = Mask2FormerHead(num_classes=5, num_queries=10,
                                   feat_channels=C, out_channels=C,
                                   scheme=scheme, num_decoder_layers=3,
                                   num_heads=4, feedforward_channels=64)
            params = head.init(rng, nf, bb, encode)
            out = head.apply(params, nf, bb, encode)
            # mask feature at the highest-res ENCODER level (16x16 here)
            want_c = 6 if scheme == 1 else 10
            assert out.shape == (2, 16, 16, want_c), out.shape
            assert np.isfinite(np.asarray(out)).all()


class TestDINOHead:
    def test_forward_and_loss(self, rng):
        from rscotr_tpu.models.heads import (CdnConfig, DINOHead,
                                             DetLossConfig,
                                             cdn_self_attn_mask, dino_loss,
                                             generate_cdn_queries)
        B, C, G = 2, 32, 5
        num_query, K = 20, 7
        enc = tiny_encoder()
        nf = neck_feats(sizes=((16, 16), (8, 8), (4, 4), (2, 2)))
        nv = sum(h * w for h, w in ((16, 16), (8, 8), (4, 4), (2, 2)))
        ek = enc.init(rng, jnp.zeros((B, nv, C)), jnp.zeros((B, nv, C)),
                      jnp.zeros((B, nv, 4, 2)),
                      ((16, 16), (8, 8), (4, 4), (2, 2)))
        encode = make_encode_fn(enc)(ek)

        cdn_cfg = CdnConfig(num_classes=K, num_queries=num_query, max_gt=G,
                            num_dn_queries=10)
        assert cdn_cfg.num_groups == 2
        assert cdn_cfg.pad_size == 20

        head = DINOHead(num_classes=K, num_query=num_query, embed_dims=C,
                        num_decoder_layers=2, num_heads=4, num_points=2,
                        feedforward_channels=64,
                        strides=(8, 16, 32, 64))
        img_hw = jnp.array([[128, 128], [100, 90]], jnp.int32)

        # GTs: xyxy absolute, padded to G with valid mask
        gt_valid = jnp.array([[True, True, False, False, False],
                              [True, False, False, False, False]])
        gt_bboxes = jnp.where(
            gt_valid[..., None],
            jnp.array([[[10, 10, 50, 60], [20, 30, 80, 90],
                        [0, 0, 1, 1], [0, 0, 1, 1], [0, 0, 1, 1]],
                       [[5, 5, 40, 40], [0, 0, 1, 1], [0, 0, 1, 1],
                        [0, 0, 1, 1], [0, 0, 1, 1]]], jnp.float32), 1.0)
        gt_labels = jnp.zeros((B, G), jnp.int32)

        label_emb = jax.random.normal(rng, (K, C))
        h = img_hw.astype(jnp.float32)
        factor = jnp.stack([h[:, 1], h[:, 0], h[:, 1], h[:, 0]], -1)[:, None]
        from rscotr_tpu.ops import bbox_xyxy_to_cxcywh
        gt_norm = bbox_xyxy_to_cxcywh(gt_bboxes / factor)
        dn_label_q, dn_bbox_q = generate_cdn_queries(
            jax.random.key(3), gt_norm, gt_labels, gt_valid, label_emb,
            cdn_cfg)
        assert dn_label_q.shape == (B, 20, C)
        attn_mask = jnp.asarray(cdn_self_attn_mask(cdn_cfg))

        params = head.init(rng, nf, img_hw, encode, dn_label_q, dn_bbox_q,
                           attn_mask)
        all_cls, all_coords, topk_score, topk_anchor = head.apply(
            params, nf, img_hw, encode, dn_label_q, dn_bbox_q, attn_mask)
        assert all_cls.shape == (2, B, 20 + num_query, K)
        assert all_coords.shape == (2, B, 20 + num_query, 4)
        assert topk_score.shape == (B, num_query, K)
        assert topk_anchor.shape == (B, num_query, 4)

        losses = dino_loss(all_cls, all_coords, topk_score, topk_anchor,
                           gt_bboxes, gt_labels, gt_valid, img_hw,
                           cdn_cfg, DetLossConfig(num_classes=K))
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        # expected keys (reference loss-dict naming)
        for k in ("interm_loss_cls", "loss_cls", "loss_bbox", "loss_iou",
                  "dn_loss_cls", "d0.loss_cls", "d0.dn_loss_cls"):
            assert k in losses

    def test_get_bboxes(self):
        from rscotr_tpu.models.heads import dino_get_bboxes
        B, Nq, K = 2, 30, 7
        rng = np.random.default_rng(0)
        cls = jnp.asarray(rng.normal(size=(B, Nq, K)).astype(np.float32))
        boxes = jnp.asarray(
            rng.uniform(0.2, 0.6, (B, Nq, 4)).astype(np.float32))
        img_hw = jnp.array([[100, 200], [50, 80]], jnp.int32)
        det, labels = dino_get_bboxes(cls, boxes, img_hw, max_per_img=10)
        assert det.shape == (B, 10, 5)
        assert labels.shape == (B, 10)
        d = np.asarray(det)
        assert (d[..., 4] >= 0).all() and (d[..., 4] <= 1).all()
        # scores sorted descending
        assert (np.diff(d[..., 4], axis=-1) <= 1e-6).all()


class TestCdn:
    def test_mask_structure(self):
        from rscotr_tpu.models.heads import CdnConfig, cdn_self_attn_mask
        cfg = CdnConfig(num_classes=5, num_queries=6, max_gt=2,
                        num_dn_queries=4)
        # groups = 2, single_pad = 2, pad = 8, tgt = 14
        m = cdn_self_attn_mask(cfg)
        assert m.shape == (14, 14)
        assert m[8:, :8].all()          # matching can't see DN
        assert not m[8:, 8:].any()      # matching sees itself
        assert not m[0:4, 0:4].any()    # group 0 sees itself
        assert m[0:4, 4:8].all()        # group 0 can't see group 1
        assert m[4:8, 0:4].all()        # group 1 can't see group 0
        assert not m[0:4, 8:].any()     # DN sees matching queries
