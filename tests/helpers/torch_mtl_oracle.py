"""From-scratch torch transliteration of the reference MTL *training recipe*.

Purpose (VERDICT r2 next #1): composed N-step train-recipe parity. Every
module here follows the reference's semantics directly
(/root/reference/models/multi/* + the mmdet/mmcv/mmseg operators they call),
with mmcv-compatible state-dict key layouts so rscotr_tpu.utils.torch_convert
maps the weights 1:1 onto our flax MTL. The trainer couples the pieces the
same way the reference does:

* MTL.train_step: forward -> _parse_losses (sum of 'loss' keys) ->
  loss * task_weight[task]   (multitask_learner.py:229-258)
* det: CdnQueryGenerator (query_denoising.py:94-201) -> DINOHead.forward
  (dino_head.py:84-150, transformer.py:30-273) -> DINOHead.loss
  (dino_head.py:152-365 + vendored detr_head.py:333-543, scipy Hungarian)
* seg: Mask2FormerHead.forward (mask2former_head.py:111-198) + mmseg CE
* cls: GAP -> fc -> mmcls LabelSmoothLoss(0.1, 'original')
* optimizer: torch AdamW + mmcv OptimizerHook grad clipping; params with
  no grad are skipped (the unused-param semantics our per-task masks mirror)

Noise (CDN label flips / box jitter) is INJECTED so both stacks consume the
same draws. No code is taken from /root/reference — these are fresh
implementations of the published semantics, sized for tiny test shapes.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from scipy.optimize import linear_sum_assignment


# ---------------------------------------------------------------------------
# shared math (reference/mmdet semantics)
# ---------------------------------------------------------------------------

def inverse_sigmoid_t(x, eps=1e-3):
    x = x.clamp(min=0, max=1)
    x1 = x.clamp(min=eps)
    x2 = (1 - x).clamp(min=eps)
    return torch.log(x1 / x2)


def cxcywh_to_xyxy_t(b):
    cx, cy, w, h = b.unbind(-1)
    return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_cxcywh_t(b):
    x1, y1, x2, y2 = b.unbind(-1)
    return torch.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], -1)


def sine_pos_encoding_t(mask, num_feats, temperature, normalize=True,
                        scale=2 * math.pi, eps=1e-6):
    """mmcv SinePositionalEncoding; mask (B, H, W) bool True=pad.
    Returns (B, 2*num_feats, H, W) NCHW like mmcv."""
    not_mask = (~mask).float()
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    if normalize:
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                        dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                        dim=4).flatten(3)
    return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)


def gen_sineembed_t(pos, num_feats, temperature=10000.0):
    """DinoTransformerDecoder.gen_sineembed_for_position (transformer.py:
    43-76); pos (..., 2|4) -> (..., num_feats * dim) order (y, x, w, h)."""
    scale = 2 * math.pi
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_feats)

    def emb(coord):
        e = (coord * scale)[..., None] / dim_t
        return torch.stack((e[..., 0::2].sin(), e[..., 1::2].cos()),
                           dim=-1).flatten(-2)

    parts = [emb(pos[..., 1]), emb(pos[..., 0])]
    if pos.shape[-1] == 4:
        parts += [emb(pos[..., 2]), emb(pos[..., 3])]
    return torch.cat(parts, -1)


def bbox_overlaps_giou_t(b1, b2, aligned=False, eps=1e-6):
    """mmdet bbox_overlaps(mode='giou'); xyxy."""
    if not aligned:
        b1 = b1[:, None]
        b2 = b2[None, :]
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    lt = torch.maximum(b1[..., :2], b2[..., :2])
    rb = torch.minimum(b1[..., 2:], b2[..., 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = (area1 + area2 - inter).clamp(min=eps)
    iou = inter / union
    lt_e = torch.minimum(b1[..., :2], b2[..., :2])
    rb_e = torch.maximum(b1[..., 2:], b2[..., 2:])
    wh_e = (rb_e - lt_e).clamp(min=0)
    enclose = (wh_e[..., 0] * wh_e[..., 1]).clamp(min=eps)
    return iou - (enclose - union) / enclose


# ---------------------------------------------------------------------------
# losses (mmdet/mmcls/mmseg semantics)
# ---------------------------------------------------------------------------

def focal_loss_t(logits, labels, label_weights, num_classes, avg_factor,
                 alpha=0.25, gamma=2.0):
    """mmdet FocalLoss(use_sigmoid=True); labels == num_classes is
    background (all-zero one-hot)."""
    target = F.one_hot(labels, num_classes + 1)[:, :num_classes].float()
    p = logits.sigmoid()
    pt = (1 - p) * target + p * (1 - target)
    focal_w = (alpha * target + (1 - alpha) * (1 - target)) * pt.pow(gamma)
    loss = F.binary_cross_entropy_with_logits(
        logits, target, reduction="none") * focal_w
    loss = loss.sum(-1) * label_weights
    return loss.sum() / avg_factor


def l1_loss_t(pred, target, weight, avg_factor):
    return ((pred - target).abs() * weight).sum() / avg_factor


def giou_loss_t(pred, target, weight, avg_factor):
    w = weight.mean(-1) if weight.dim() > 1 else weight
    loss = 1 - bbox_overlaps_giou_t(pred, target, aligned=True)
    return (loss * w).sum() / avg_factor


def label_smooth_loss_t(logits, labels_or_soft, eps=0.1):
    """mmcls LabelSmoothLoss mode='original'."""
    K = logits.shape[-1]
    if labels_or_soft.dim() == 1:
        t = F.one_hot(labels_or_soft, K).float()
    else:
        t = labels_or_soft
    t = t * (1 - eps) + eps / K
    return (-(t * F.log_softmax(logits, -1)).sum(-1)).mean()


# ---------------------------------------------------------------------------
# Hungarian assignment (mmdet HungarianAssigner, scipy LAP)
# ---------------------------------------------------------------------------

def hungarian_assign_t(bbox_pred, cls_pred, gt_bboxes, gt_labels, img_hw,
                       cls_w=2.0, l1_w=5.0, iou_w=2.0,
                       alpha=0.25, gamma=2.0, eps=1e-12):
    """Returns (row_idx into gts, col_idx into queries)."""
    h, w = img_hw
    factor = bbox_pred.new_tensor([w, h, w, h])[None]
    # FocalLossCost
    p = cls_pred.sigmoid()
    neg_cost = -(1 - p + eps).log() * (1 - alpha) * p.pow(gamma)
    pos_cost = -(p + eps).log() * alpha * (1 - p).pow(gamma)
    cls_cost = (pos_cost - neg_cost)[:, gt_labels] * cls_w
    # BBoxL1Cost on normalized cxcywh
    gt_norm = xyxy_to_cxcywh_t(gt_bboxes / factor)
    reg_cost = torch.cdist(bbox_pred, gt_norm, p=1) * l1_w
    # IoUCost (giou) on absolute xyxy
    bboxes = cxcywh_to_xyxy_t(bbox_pred) * factor
    iou_cost = -bbox_overlaps_giou_t(bboxes, gt_bboxes) * iou_w
    # mmdet solves on (num_query, num_gt): matched rows are queries
    cost = (cls_cost + reg_cost + iou_cost).detach().numpy()
    q_rows, g_cols = linear_sum_assignment(cost)
    return g_cols, q_rows    # gt index per match, query index per match


# ---------------------------------------------------------------------------
# modules (mmcv state-dict layouts)
# ---------------------------------------------------------------------------

class TorchFFN(nn.Module):
    """mmcv FFN key layout: layers.0.0 (Linear), layers.1 (Linear)."""

    def __init__(self, C, Fh):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(C, Fh), nn.ReLU()), nn.Linear(Fh, C))

    def forward(self, x):
        return x + self.layers(x)


class TorchDetrMHA(nn.Module):
    """mmcv MultiheadAttention: wraps torch MHA as .attn, pos added to q/k,
    residual on the pre-pos query."""

    def __init__(self, C, H):
        super().__init__()
        self.attn = nn.MultiheadAttention(C, H, batch_first=True)

    def forward(self, q, k, v, q_pos=None, k_pos=None, attn_mask=None,
                key_padding_mask=None):
        out, _ = self.attn(q + q_pos if q_pos is not None else q,
                           k + k_pos if k_pos is not None else k,
                           v, attn_mask=attn_mask,
                           key_padding_mask=key_padding_mask)
        return q + out


class TorchMSDA(nn.Module):
    """mmcv MultiScaleDeformableAttention: grid_sample core,
    value masked at padded keys, 2- and 4-dim reference points."""

    def __init__(self, C, H, L, P):
        super().__init__()
        self.C, self.H, self.L, self.P = C, H, L, P
        self.sampling_offsets = nn.Linear(C, H * L * P * 2)
        self.attention_weights = nn.Linear(C, H * L * P)
        self.value_proj = nn.Linear(C, C)
        self.output_proj = nn.Linear(C, C)

    def forward(self, query, value, query_pos, ref, shapes,
                key_padding_mask=None):
        B, Q, C = query.shape
        H, L, P = self.H, self.L, self.P
        q = query + query_pos if query_pos is not None else query
        Nv = value.shape[1]
        v = self.value_proj(value)
        if key_padding_mask is not None:
            v = v.masked_fill(key_padding_mask[..., None], 0.0)
        v = v.view(B, Nv, H, C // H)
        off = self.sampling_offsets(q).view(B, Q, H, L, P, 2)
        aw = self.attention_weights(q).view(B, Q, H, L * P)
        aw = aw.softmax(-1).view(B, Q, H, L, P)
        if ref.shape[-1] == 2:
            normalizer = torch.tensor([[w, h] for h, w in shapes],
                                      dtype=torch.float32)
            loc = ref[:, :, None, :, None, :] + \
                off / normalizer[None, None, None, :, None, :]
        else:
            loc = ref[:, :, None, :, None, :2] + \
                off / P * ref[:, :, None, :, None, 2:] * 0.5
        # grid_sample core (mmcv multi_scale_deformable_attn_pytorch)
        samples = []
        start = 0
        for lvl, (h, wd) in enumerate(shapes):
            vl = v[:, start:start + h * wd].permute(0, 2, 3, 1).reshape(
                B * H, C // H, h, wd)
            grid = loc[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(
                B * H, Q, P, 2) * 2 - 1
            samples.append(F.grid_sample(vl, grid, mode="bilinear",
                                         padding_mode="zeros",
                                         align_corners=False))
            start += h * wd
        samp = torch.stack(samples, dim=-2)            # (B*H, D, Q, L, P)
        ww = aw.permute(0, 2, 1, 3, 4).reshape(B * H, 1, Q, L, P)
        out = (samp * ww).sum((-1, -2))
        out = out.reshape(B, H, C // H, Q).permute(0, 3, 1, 2).reshape(
            B, Q, C)
        return query + self.output_proj(out)


class TorchEncLayer(nn.Module):
    """Shared-encoder layer: MSDA -> norm -> FFN -> norm
    (configs/multi/...py:44-49 operation_order)."""

    def __init__(self, C, H, L, P, Fh):
        super().__init__()
        self.attentions = nn.ModuleList([TorchMSDA(C, H, L, P)])
        self.ffns = nn.ModuleList([TorchFFN(C, Fh)])
        self.norms = nn.ModuleList([nn.LayerNorm(C), nn.LayerNorm(C)])

    def forward(self, x, pos, ref, shapes, key_padding_mask=None):
        x = self.attentions[0](x, x, pos, ref, shapes, key_padding_mask)
        x = self.norms[0](x)
        x = self.ffns[0](x)
        return self.norms[1](x)


class TorchEncoder(nn.Module):
    def __init__(self, n, C, H, L, P, Fh):
        super().__init__()
        self.layers = nn.ModuleList(
            [TorchEncLayer(C, H, L, P, Fh) for _ in range(n)])

    def forward(self, x, pos, ref, shapes, key_padding_mask=None):
        for layer in self.layers:
            x = layer(x, pos, ref, shapes, key_padding_mask)
        return x


class TorchDinoDecLayer(nn.Module):
    """self_attn(MHA) -> norm -> cross_attn(MSDA) -> norm -> ffn -> norm."""

    def __init__(self, C, H, L, P, Fh):
        super().__init__()
        self.attentions = nn.ModuleList(
            [TorchDetrMHA(C, H), TorchMSDA(C, H, L, P)])
        self.ffns = nn.ModuleList([TorchFFN(C, Fh)])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(3)])

    def forward(self, x, query_pos, memory, ref, shapes, self_attn_mask,
                key_padding_mask):
        x = self.attentions[0](x, x, x, query_pos, query_pos,
                               attn_mask=self_attn_mask)
        x = self.norms[0](x)
        x = self.attentions[1](x, memory, query_pos, ref, shapes,
                               key_padding_mask)
        x = self.norms[1](x)
        x = self.ffns[0](x)
        return self.norms[2](x)


class _RefPointHead(nn.Module):
    def __init__(self, C):
        super().__init__()
        self.layers = nn.ModuleList([nn.Linear(2 * C, C), nn.Linear(C, C)])

    def forward(self, x):
        return self.layers[1](F.relu(self.layers[0](x)))


class TorchDINOHead(nn.Module):
    """Reference DINOHead + DinoTransformer(+Decoder), mm key layout."""

    def __init__(self, num_classes, num_query, C, H, L, P, Fh, n_dec,
                 strides, pos_temperature=20.0):
        super().__init__()
        self.K, self.NQ, self.C = num_classes, num_query, C
        self.L, self.n_dec = L, n_dec
        self.strides = strides
        self.pos_temperature = pos_temperature
        self.label_embedding = nn.Embedding(num_classes, C)
        tr = nn.Module()
        tr.level_embeds = nn.Parameter(torch.randn(L, C))
        tr.query_embed = nn.Embedding(num_query, C)
        tr.enc_output = nn.Linear(C, C)
        tr.enc_output_norm = nn.LayerNorm(C)
        dec = nn.Module()
        dec.layers = nn.ModuleList(
            [TorchDinoDecLayer(C, H, L, P, Fh) for _ in range(n_dec)])
        dec.norm = nn.LayerNorm(C)
        dec.ref_point_head = _RefPointHead(C)
        tr.decoder = dec
        self.transformer = tr
        self.cls_branches = nn.ModuleList(
            [nn.Linear(C, num_classes) for _ in range(n_dec + 1)])

        def reg():
            return nn.Sequential(nn.Linear(C, C), nn.ReLU(),
                                 nn.Linear(C, C), nn.ReLU(), nn.Linear(C, 4))

        self.reg_branches = nn.ModuleList([reg() for _ in range(n_dec + 1)])
        with torch.no_grad():
            for r in self.reg_branches:
                r[4].weight.zero_()
                r[4].bias.zero_()

    # -- helpers (mmdet DeformableDetrTransformer semantics) ----------------
    @staticmethod
    def _valid_ratio(mask):
        _, H, W = mask.shape
        valid_h = (~mask[:, :, 0]).sum(1).float()
        valid_w = (~mask[:, 0, :]).sum(1).float()
        return torch.stack([valid_w / W, valid_h / H], -1)

    @staticmethod
    def _reference_points(shapes, valid_ratios):
        refs = []
        for lvl, (h, w) in enumerate(shapes):
            ry, rx = torch.meshgrid(
                torch.linspace(0.5, h - 0.5, h),
                torch.linspace(0.5, w - 0.5, w), indexing="ij")
            ry = ry.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
            rx = rx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
            refs.append(torch.stack((rx, ry), -1))
        ref = torch.cat(refs, 1)
        return ref[:, :, None] * valid_ratios[:, None]

    def _gen_proposals(self, memory, mask_flat, shapes):
        B = memory.shape[0]
        proposals = []
        cur = 0
        for lvl, (h, w) in enumerate(shapes):
            m = mask_flat[:, cur:cur + h * w].view(B, h, w, 1)
            valid_h = (~m[:, :, 0, 0]).sum(1)
            valid_w = (~m[:, 0, :, 0]).sum(1)
            gy, gx = torch.meshgrid(torch.linspace(0, h - 1, h),
                                    torch.linspace(0, w - 1, w),
                                    indexing="ij")
            grid = torch.cat([gx.unsqueeze(-1), gy.unsqueeze(-1)], -1)
            scale = torch.cat([valid_w.unsqueeze(-1), valid_h.unsqueeze(-1)],
                              1).view(B, 1, 1, 2).float()
            grid = (grid.unsqueeze(0).expand(B, -1, -1, -1) + 0.5) / scale
            wh = torch.ones_like(grid) * 0.05 * (2.0 ** lvl)
            proposals.append(torch.cat((grid, wh), -1).view(B, -1, 4))
            cur += h * w
        props = torch.cat(proposals, 1)
        valid = ((props > 0.01) & (props < 0.99)).all(-1, keepdim=True)
        props = torch.log(props / (1 - props))
        props = props.masked_fill(mask_flat.unsqueeze(-1), float("inf"))
        props = props.masked_fill(~valid, float("inf"))
        mem = memory.masked_fill(mask_flat.unsqueeze(-1), 0.0)
        mem = mem.masked_fill(~valid, 0.0)
        mem = self.transformer.enc_output_norm(
            self.transformer.enc_output(mem))
        return mem, props

    def forward(self, feats, img_hw_list, dn_label_query, dn_bbox_query,
                attn_mask, encoder):
        """feats: NCHW maps high->low res; img_hw_list: [(h, w)] content."""
        B = feats[0].shape[0]
        C = self.C
        in_h = feats[0].shape[2] * self.strides[0]
        in_w = feats[0].shape[3] * self.strides[0]
        img_masks = torch.ones(B, in_h, in_w)
        for b, (h, w) in enumerate(img_hw_list):
            img_masks[b, :h, :w] = 0
        mlvl_masks, mlvl_pos = [], []
        for f in feats:
            m = F.interpolate(img_masks[None],
                              size=f.shape[-2:]).to(torch.bool).squeeze(0)
            mlvl_masks.append(m)
            mlvl_pos.append(sine_pos_encoding_t(
                m, C // 2, self.pos_temperature, normalize=True))

        toks, poss, mflat, shapes = [], [], [], []
        for lvl, (f, m, pe) in enumerate(zip(feats, mlvl_masks, mlvl_pos)):
            h, w = f.shape[-2:]
            shapes.append((h, w))
            toks.append(f.flatten(2).transpose(1, 2))
            poss.append(pe.flatten(2).transpose(1, 2) +
                        self.transformer.level_embeds[lvl].view(1, 1, -1))
            mflat.append(m.flatten(1))
        tokens = torch.cat(toks, 1)
        pos_flat = torch.cat(poss, 1)
        mask_flat = torch.cat(mflat, 1)
        valid_ratios = torch.stack(
            [self._valid_ratio(m) for m in mlvl_masks], 1)
        enc_ref = self._reference_points(shapes, valid_ratios)
        memory = encoder(tokens, pos_flat, enc_ref, shapes,
                         key_padding_mask=mask_flat)

        out_memory, out_props = self._gen_proposals(memory, mask_flat,
                                                    shapes)
        enc_cls = self.cls_branches[self.n_dec](out_memory)
        enc_coord_unact = self.reg_branches[self.n_dec](out_memory) + \
            out_props
        topk_idx = torch.topk(enc_cls.max(-1)[0], self.NQ, dim=1)[1]
        topk_score = torch.gather(
            enc_cls, 1, topk_idx.unsqueeze(-1).repeat(1, 1, self.K))
        topk_coords_unact = torch.gather(
            enc_coord_unact, 1, topk_idx.unsqueeze(-1).repeat(1, 1, 4))
        topk_anchor = topk_coords_unact.sigmoid()
        topk_coords_unact = topk_coords_unact.detach()

        query = self.transformer.query_embed.weight[None].repeat(B, 1, 1)
        if dn_label_query is not None:
            query = torch.cat([dn_label_query, query], 1)
            ref_unact = torch.cat([dn_bbox_query, topk_coords_unact], 1)
        else:
            ref_unact = topk_coords_unact
        reference_points = ref_unact.sigmoid()

        inter_states = []
        inter_refs = [reference_points]
        x = query
        ref = reference_points
        for lid, layer in enumerate(self.transformer.decoder.layers):
            ref_input = ref[:, :, None] * torch.cat(
                [valid_ratios, valid_ratios], -1)[:, None]
            sine = gen_sineembed_t(ref_input[:, :, 0, :], C // 2)
            query_pos = self.transformer.decoder.ref_point_head(sine)
            x = layer(x, query_pos, memory, ref_input, shapes,
                      attn_mask, mask_flat)
            tmp = self.reg_branches[lid](x)
            new_ref = (tmp + inverse_sigmoid_t(ref)).sigmoid()
            ref = new_ref.detach()
            inter_states.append(self.transformer.decoder.norm(x))
            inter_refs.append(new_ref)    # look forward twice

        all_cls, all_coords = [], []
        for lvl in range(self.n_dec):
            reference = inverse_sigmoid_t(inter_refs[lvl])
            all_cls.append(self.cls_branches[lvl](inter_states[lvl]))
            tmp = self.reg_branches[lvl](inter_states[lvl]) + reference
            all_coords.append(tmp.sigmoid())
        return (torch.stack(all_cls), torch.stack(all_coords),
                topk_score, topk_anchor)


# ---------------------------------------------------------------------------
# CDN (query_denoising.py:94-201, torch, injected noise, differentiable)
# ---------------------------------------------------------------------------

def cdn_generate_t(gt_boxes_list, gt_labels_list, img_hw_list,
                   label_embedding, num_classes, num_queries, num_dn,
                   p_flat, new_label_flat, sign_flat, part_flat,
                   label_noise_scale=0.5, box_noise_scale=1.0):
    """gt_boxes_list: per-image (n, 4) ABSOLUTE xyxy; returns
    (dn_label_query, dn_bbox_query, attn_mask, dn_meta)."""
    B = len(gt_labels_list)
    known_num = [len(t) for t in gt_labels_list]
    single_pad = int(max(known_num))
    num_groups = max(num_dn // single_pad, 1)
    pad_size = int(single_pad * 2 * num_groups)

    # normalized cxcywh per the reference generator
    boxes_norm = []
    for (h, w), bx in zip(img_hw_list, gt_boxes_list):
        factor = bx.new_tensor([w, h, w, h])[None]
        boxes_norm.append(xyxy_to_cxcywh_t(bx / factor))
    labels = torch.cat(gt_labels_list)
    boxes = torch.cat(boxes_norm, 0)
    batch_idx = torch.cat([torch.full((n,), i, dtype=torch.long)
                           for i, n in enumerate(known_num)])

    known_labels = labels.repeat(2 * num_groups)
    known_bid = batch_idx.repeat(2 * num_groups)
    known_bboxs = boxes.repeat(2 * num_groups, 1)
    known_labels_expand = known_labels.clone()
    chosen = torch.from_numpy(p_flat) < (label_noise_scale * 0.5)
    known_labels_expand[chosen] = torch.from_numpy(
        new_label_flat).long()[chosen]

    total = len(boxes)
    positive_idx = (torch.arange(total)[None] +
                    (torch.arange(num_groups) * total * 2)[:, None]).flatten()
    negative_idx = positive_idx + total

    known_bbox_ = torch.zeros_like(known_bboxs)
    known_bbox_[:, :2] = known_bboxs[:, :2] - known_bboxs[:, 2:] / 2
    known_bbox_[:, 2:] = known_bboxs[:, :2] + known_bboxs[:, 2:] / 2
    diff = torch.zeros_like(known_bboxs)
    diff[:, :2] = known_bboxs[:, 2:] / 2
    diff[:, 2:] = known_bboxs[:, 2:] / 2
    rand_part = torch.from_numpy(part_flat.copy()).float()
    rand_part[negative_idx] += 1.0
    rand_part = rand_part * torch.from_numpy(sign_flat).float()
    known_bbox_ = known_bbox_ + rand_part * diff * box_noise_scale
    known_bbox_ = known_bbox_.clamp(0.0, 1.0)
    known_bbox_expand = torch.zeros_like(known_bbox_)
    known_bbox_expand[:, :2] = (known_bbox_[:, :2] + known_bbox_[:, 2:]) / 2
    known_bbox_expand[:, 2:] = known_bbox_[:, 2:] - known_bbox_[:, :2]

    input_label_embed = label_embedding(known_labels_expand)
    input_bbox_embed = inverse_sigmoid_t(known_bbox_expand)

    C = input_label_embed.shape[-1]
    iq_label = input_label_embed.new_zeros(B, pad_size, C)
    iq_bbox = input_bbox_embed.new_zeros(B, pad_size, 4)
    map_known = torch.cat([torch.arange(n) for n in known_num])
    map_known = torch.cat(
        [map_known + single_pad * i for i in range(2 * num_groups)])
    iq_label = iq_label.index_put((known_bid, map_known), input_label_embed)
    iq_bbox = iq_bbox.index_put((known_bid, map_known), input_bbox_embed)

    tgt = pad_size + num_queries
    attn_mask = torch.zeros(tgt, tgt, dtype=torch.bool)
    attn_mask[pad_size:, :pad_size] = True
    for i in range(num_groups):
        attn_mask[single_pad * 2 * i:single_pad * 2 * (i + 1),
                  single_pad * 2 * (i + 1):pad_size] = True
        attn_mask[single_pad * 2 * i:single_pad * 2 * (i + 1),
                  :single_pad * 2 * i] = True
    return iq_label, iq_bbox, attn_mask, dict(pad_size=pad_size,
                                              num_dn_group=num_groups)


# ---------------------------------------------------------------------------
# DINO loss (detr_head.py:333-543 + dino_head.py:236-365)
# ---------------------------------------------------------------------------

def dino_loss_t(all_cls, all_coords, topk_score, topk_anchor,
                gt_boxes_list, gt_labels_list, img_hw_list, dn_meta,
                num_classes, cls_w=1.0, bbox_w=5.0, iou_w=2.0):
    P = dn_meta["pad_size"]
    dn_cls, dn_coords = all_cls[:, :, :P], all_coords[:, :, :P]
    m_cls, m_coords = all_cls[:, :, P:], all_coords[:, :, P:]
    out = {}

    def loss_single(cls_scores, bbox_preds):
        B, Nq, K = cls_scores.shape
        labels = torch.full((B, Nq), num_classes, dtype=torch.long)
        label_weights = torch.ones(B, Nq)
        bbox_targets = torch.zeros(B, Nq, 4)
        bbox_weights = torch.zeros(B, Nq, 4)
        num_pos = 0
        for b in range(B):
            g_idx, q_idx = hungarian_assign_t(
                bbox_preds[b].detach(), cls_scores[b].detach(),
                gt_boxes_list[b], gt_labels_list[b], img_hw_list[b])
            num_pos += len(g_idx)
            h, w = img_hw_list[b]
            factor = bbox_preds.new_tensor([w, h, w, h])[None]
            gt_norm = xyxy_to_cxcywh_t(gt_boxes_list[b] / factor)
            labels[b, q_idx] = gt_labels_list[b][g_idx]
            bbox_targets[b, q_idx] = gt_norm[g_idx]
            bbox_weights[b, q_idx] = 1.0
        cls_avg = max(num_pos * 1.0, 1)
        loss_cls = focal_loss_t(cls_scores.reshape(-1, K),
                                labels.reshape(-1),
                                label_weights.reshape(-1), K,
                                cls_avg) * cls_w
        num_pos_f = max(float(num_pos), 1.0)
        factors = torch.cat(
            [bbox_preds.new_tensor([w, h, w, h])[None].repeat(Nq, 1)
             for (h, w) in img_hw_list], 0)
        preds = bbox_preds.reshape(-1, 4)
        bboxes = cxcywh_to_xyxy_t(preds) * factors
        bboxes_gt = cxcywh_to_xyxy_t(bbox_targets.reshape(-1, 4)) * factors
        loss_iou = giou_loss_t(bboxes, bboxes_gt,
                               bbox_weights.reshape(-1, 4),
                               num_pos_f) * iou_w
        loss_bbox = l1_loss_t(preds, bbox_targets.reshape(-1, 4),
                              bbox_weights.reshape(-1, 4),
                              num_pos_f) * bbox_w
        return loss_cls, loss_bbox, loss_iou

    def loss_dn_single(cls_scores, bbox_preds):
        B, Pq, K = cls_scores.shape
        num_groups = dn_meta["num_dn_group"]
        single_pad = P // num_groups
        labels = torch.full((B, Pq), num_classes, dtype=torch.long)
        label_weights = torch.ones(B, Pq)
        bbox_targets = torch.zeros(B, Pq, 4)
        bbox_weights = torch.zeros(B, Pq, 4)
        num_pos = num_neg = 0
        for b in range(B):
            n = len(gt_labels_list[b])
            if n > 0:
                t = torch.arange(n)[None].repeat(num_groups, 1)
                pos_assigned = t.flatten()
                pos_inds = ((torch.arange(num_groups) * single_pad)[:, None]
                            + t).flatten()
            else:
                pos_inds = pos_assigned = torch.zeros(0, dtype=torch.long)
            num_pos += len(pos_inds)
            num_neg += len(pos_inds)
            labels[b, pos_inds] = gt_labels_list[b][pos_assigned]
            h, w = img_hw_list[b]
            factor = bbox_preds.new_tensor([w, h, w, h])[None]
            gt_norm = xyxy_to_cxcywh_t(gt_boxes_list[b] / factor)
            bbox_targets[b, pos_inds] = gt_norm.repeat(num_groups, 1)
            bbox_weights[b, pos_inds] = 1.0
        cls_avg = max(num_pos * 1.0, 1)   # bg_cls_weight = 0
        loss_cls = focal_loss_t(cls_scores.reshape(-1, K),
                                labels.reshape(-1),
                                label_weights.reshape(-1), K,
                                cls_avg) * cls_w
        num_pos_f = max(float(num_pos), 1.0)
        factors = torch.cat(
            [bbox_preds.new_tensor([w, h, w, h])[None].repeat(Pq, 1)
             for (h, w) in img_hw_list], 0)
        preds = bbox_preds.reshape(-1, 4)
        bboxes = cxcywh_to_xyxy_t(preds) * factors
        bboxes_gt = cxcywh_to_xyxy_t(bbox_targets.reshape(-1, 4)) * factors
        loss_iou = giou_loss_t(bboxes, bboxes_gt,
                               bbox_weights.reshape(-1, 4),
                               num_pos_f) * iou_w
        loss_bbox = l1_loss_t(preds, bbox_targets.reshape(-1, 4),
                              bbox_weights.reshape(-1, 4),
                              num_pos_f) * bbox_w
        return loss_cls, loss_bbox, loss_iou

    e_cls, e_bbox, e_iou = loss_single(topk_score, topk_anchor)
    out["interm_loss_cls"] = e_cls
    out["interm_loss_bbox"] = e_bbox
    out["interm_loss_iou"] = e_iou
    L = m_cls.shape[0]
    for lyr in range(L):
        c, b, i = loss_single(m_cls[lyr], m_coords[lyr])
        dc, db, di = loss_dn_single(dn_cls[lyr], dn_coords[lyr])
        if lyr == L - 1:
            out["loss_cls"], out["loss_bbox"], out["loss_iou"] = c, b, i
            out["dn_loss_cls"], out["dn_loss_bbox"], out["dn_loss_iou"] = \
                dc, db, di
        else:
            out[f"d{lyr}.loss_cls"] = c
            out[f"d{lyr}.loss_bbox"] = b
            out[f"d{lyr}.loss_iou"] = i
            out[f"d{lyr}.dn_loss_cls"] = dc
            out[f"d{lyr}.dn_loss_bbox"] = db
            out[f"d{lyr}.dn_loss_iou"] = di
    return out


# ---------------------------------------------------------------------------
# Mask2Former head (mask2former_head.py:111-198 + pixel_decoder.py:81-175)
# ---------------------------------------------------------------------------

class TorchMaskedDecLayer(nn.Module):
    """cross_attn -> norm -> self_attn -> norm -> ffn -> norm."""

    def __init__(self, C, H, Fh):
        super().__init__()
        self.attentions = nn.ModuleList(
            [TorchDetrMHA(C, H), TorchDetrMHA(C, H)])
        self.ffns = nn.ModuleList([TorchFFN(C, Fh)])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(3)])

    def forward(self, q, mem, q_pos, k_pos, cross_mask):
        q = self.attentions[0](q, mem, mem, q_pos, k_pos, cross_mask)
        q = self.norms[0](q)
        q = self.attentions[1](q, q, q, q_pos, q_pos)
        q = self.norms[1](q)
        q = self.ffns[0](q)
        return self.norms[2](q)


class TorchMask2FormerHead(nn.Module):
    def __init__(self, num_classes, num_queries, C, H, Fh, n_dec, L,
                 strides, pos_temperature=10000.0):
        super().__init__()
        self.K, self.Q, self.C, self.H = num_classes, num_queries, C, H
        self.L, self.n_dec = L, n_dec
        self.strides = strides
        self.pos_temperature = pos_temperature
        self.query_embed = nn.Embedding(num_queries, C)
        self.query_feat = nn.Embedding(num_queries, C)
        self.level_embed = nn.Embedding(L, C)
        self.mask_embed = nn.Sequential(nn.Linear(C, C), nn.ReLU(),
                                        nn.Linear(C, C), nn.ReLU(),
                                        nn.Linear(C, C))
        td = nn.Module()
        td.post_norm = nn.LayerNorm(C)
        td.layers = nn.ModuleList(
            [TorchMaskedDecLayer(C, H, Fh) for _ in range(n_dec)])
        self.transformer_decoder = td
        pd = nn.Module()
        pd.level_encoding = nn.Embedding(L, C)
        pd.mask_feature = nn.Conv2d(C, C, 1)
        self.pixel_decoder = pd

    def _pixel_decode(self, encoder, neck_feats):
        """Shared-encoder pixel decoder, num_fpn == 0 (flagship case)."""
        B = neck_feats[0].shape[0]
        C = self.C
        n_in = len(neck_feats)
        toks, poss, refs, shapes = [], [], [], []
        for i in range(self.L):
            level_idx = n_in - i - 1
            f = neck_feats[level_idx]
            h, w = f.shape[-2:]
            mask = torch.zeros(B, h, w, dtype=torch.bool)
            pe = sine_pos_encoding_t(mask, C // 2, self.pos_temperature,
                                     normalize=True)
            pe = pe + self.pixel_decoder.level_encoding.weight[i].view(
                1, -1, 1, 1)
            stride = self.strides[level_idx]
            xs = (torch.arange(w).float() + 0.5) * stride
            ys = (torch.arange(h).float() + 0.5) * stride
            gx, gy = torch.meshgrid(xs, ys, indexing="xy")
            pts = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1)
            factor = torch.tensor([[w * stride, h * stride]]).float()
            refs.append(pts / factor)
            toks.append(f.flatten(2).transpose(1, 2))
            poss.append(pe.flatten(2).transpose(1, 2))
            shapes.append((h, w))
        tokens = torch.cat(toks, 1)
        pos = torch.cat(poss, 1)
        ref = torch.cat(refs, 0)
        ref = ref[None, :, None].repeat(B, 1, self.L, 1)
        memory = encoder(tokens, pos, ref, shapes)
        outs, start = [], 0
        for (h, w) in shapes:
            outs.append(memory[:, start:start + h * w].transpose(
                1, 2).reshape(B, -1, h, w))
            start += h * w
        mask_feature = self.pixel_decoder.mask_feature(outs[-1])
        return mask_feature, outs[:self.L]

    def _forward_head(self, q, mask_feature, target_hw):
        d = self.transformer_decoder.post_norm(q)
        me = self.mask_embed(d)
        mask_pred = torch.einsum("bqc,bchw->bqhw", me, mask_feature)
        seg = mask_pred    # scheme 2
        am = F.interpolate(mask_pred, target_hw, mode="bilinear",
                           align_corners=False)
        am = am.flatten(2).unsqueeze(1).repeat(1, self.H, 1, 1).flatten(0, 1)
        am = (am.sigmoid() < 0.5).detach()
        return seg, am

    def forward(self, encoder, neck_feats):
        B = neck_feats[0].shape[0]
        mask_feature, ms_feats = self._pixel_decode(encoder, neck_feats)
        dec_inputs, dec_pos = [], []
        for i in range(self.L):
            f = ms_feats[i]
            h, w = f.shape[-2:]
            x = f.flatten(2).transpose(1, 2) + \
                self.level_embed.weight[i].view(1, 1, -1)
            mask = torch.zeros(B, h, w, dtype=torch.bool)
            pe = sine_pos_encoding_t(mask, self.C // 2,
                                     self.pos_temperature, normalize=True)
            dec_inputs.append(x)
            dec_pos.append(pe.flatten(2).transpose(1, 2))
        q = self.query_feat.weight[None].repeat(B, 1, 1)
        qp = self.query_embed.weight[None].repeat(B, 1, 1)
        seg, am = self._forward_head(q, mask_feature,
                                     ms_feats[0].shape[-2:])
        for i in range(self.n_dec):
            lvl = i % self.L
            am[torch.where(am.sum(-1) == am.shape[-1])] = False
            q = self.transformer_decoder.layers[i](
                q, dec_inputs[lvl], qp, dec_pos[lvl], am)
            seg, am = self._forward_head(
                q, mask_feature, ms_feats[(i + 1) % self.L].shape[-2:])
        return seg     # (B, Q, h, w) — scheme-2 logits


# ---------------------------------------------------------------------------
# the composed trainer
# ---------------------------------------------------------------------------

class TorchMTL(nn.Module):
    """Shared backbone/neck/encoder + 3 heads, mm state-dict layout."""

    def __init__(self, swin, neck, encoder, cls_head, bbox_head, seg_head):
        super().__init__()
        self.backbone = swin
        self.neck = neck
        self.shared_encoder = encoder
        self.cls_head = cls_head
        self.bbox_head = bbox_head
        self.seg_head = seg_head

    def extract_feat(self, img_nhwc):
        bb = self.backbone(img_nhwc)          # NHWC (single stage)
        nk = self.neck([bb.permute(0, 3, 1, 2)])
        return nk, bb


class TorchClsHead(nn.Module):
    def __init__(self, in_ch, num_classes):
        super().__init__()
        self.fc = nn.Linear(in_ch, num_classes)

    def forward(self, backbone_feat_nhwc):
        return self.fc(backbone_feat_nhwc.mean(dim=(1, 2)))


class TorchMTLTrainer:
    """mmcv IterBasedRunner + OptimizerHook semantics: per-iter
    zero_grad -> forward -> _parse_losses -> task_weight scale ->
    backward -> clip_grad_norm(params with grads) -> AdamW.step()."""

    def __init__(self, model: TorchMTL, task_weight, cdn_cfg, det_cfg,
                 lr=1e-3, weight_decay=1e-4, grad_clip=0.1,
                 label_smooth=0.1):
        self.model = model
        self.task_weight = task_weight
        self.cdn_cfg = cdn_cfg        # dict(num_classes, num_queries, num_dn)
        self.det_cfg = det_cfg        # dict(num_classes)
        self.label_smooth = label_smooth
        self.grad_clip = grad_clip
        self.opt = torch.optim.AdamW(model.parameters(), lr=lr,
                                     betas=(0.9, 0.999), eps=1e-8,
                                     weight_decay=weight_decay)

    def _losses_cls(self, batch):
        img = torch.from_numpy(batch["img"])
        labels = torch.from_numpy(batch["gt_label"]).long()
        _, bb = self.model.extract_feat(img)
        logits = self.model.cls_head(bb)
        return {"loss_cls": label_smooth_loss_t(logits, labels,
                                                self.label_smooth)}

    def _losses_seg(self, batch):
        img = torch.from_numpy(batch["img"])
        gt = torch.from_numpy(batch["gt_semantic_seg"]).long()
        nk, _ = self.model.extract_feat(img)
        seg = self.model.seg_head(
            self.model.shared_encoder, [f for f in nk])
        seg = F.interpolate(seg, gt.shape[-2:], mode="bilinear",
                            align_corners=False)
        # mmseg CE, reduction 'mean' over all pixels (ignore_index=255
        # never fires: pad label 5 is a real channel of the scheme-2
        # logits — the reference's quirk)
        loss = F.cross_entropy(seg, gt, ignore_index=255)
        return {"loss_ce": loss}

    def _losses_det(self, batch, cdn_noise):
        img = torch.from_numpy(batch["img"])
        img_hw = [tuple(int(v) for v in hw) for hw in batch["img_hw"]]
        gt_boxes_list, gt_labels_list = [], []
        for b in range(len(img)):
            n = int(batch["gt_valid"][b].sum())
            gt_boxes_list.append(
                torch.from_numpy(batch["gt_bboxes"][b, :n]).float())
            gt_labels_list.append(
                torch.from_numpy(batch["gt_labels"][b, :n]).long())
        dn_label_q, dn_bbox_q, attn_mask, dn_meta = cdn_generate_t(
            gt_boxes_list, gt_labels_list, img_hw,
            self.model.bbox_head.label_embedding,
            self.cdn_cfg["num_classes"], self.cdn_cfg["num_queries"],
            self.cdn_cfg["num_dn"], **cdn_noise)
        nk, _ = self.model.extract_feat(img)
        feats = [f for f in nk]
        outs = self.model.bbox_head(feats, img_hw, dn_label_q, dn_bbox_q,
                                    attn_mask, self.model.shared_encoder)
        return dino_loss_t(*outs, gt_boxes_list, gt_labels_list, img_hw,
                           dn_meta, self.det_cfg["num_classes"])

    def step(self, task, batch, cdn_noise=None):
        """One train iter; returns {loss_name: float} incl. 'loss' total
        (all already scaled by task_weight, like our log_vars)."""
        self.opt.zero_grad(set_to_none=True)
        if task == "cls":
            losses = self._losses_cls(batch)
        elif task == "seg":
            losses = self._losses_seg(batch)
        else:
            losses = self._losses_det(batch, cdn_noise)
        total = sum(losses.values())
        weight = self.task_weight[task]
        (total * weight).backward()
        params = [p for p in self.model.parameters() if p.grad is not None]
        torch.nn.utils.clip_grad_norm_(params, self.grad_clip)
        self.opt.step()
        out = {k: float(v.detach()) * weight for k, v in losses.items()}
        out["loss"] = float(total.detach()) * weight
        return out


# ---------------------------------------------------------------------------
# tiny Swin backbone (original-repo key layout -> convert_swin_original)
# and ChannelMapper (mmdet key layout -> convert_channel_mapper)
# ---------------------------------------------------------------------------

class TorchWindowAttention(nn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        from rscotr_tpu.models.backbones.swin import _rel_pos_index
        self.dim, self.heads, self.window = dim, heads, window
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        self.register_buffer(
            "rel_idx", torch.from_numpy(_rel_pos_index(window)).long())

    def forward(self, x, mask=None):
        B_, n, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B_, n, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (C // h) ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.rel_idx.reshape(-1)].reshape(n, n, h).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, h, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, h, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, n, C)
        return self.proj(x)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, heads, window)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x):
        from rscotr_tpu.models.backbones.swin import _shift_attn_mask
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        x = self.norm1(x)
        pad_b = (w - H % w) % w
        pad_r = (w - W % w) % w
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        shift = self.shift if min(H, W) > w else 0
        if shift:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            mask = torch.from_numpy(
                _shift_attn_mask(Hp, Wp, w, shift)).float()
        else:
            mask = None
        xw = x.view(B, Hp // w, w, Wp // w, w, C).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
        xw = self.attn(xw, mask)
        x = xw.view(B, Hp // w, Wp // w, w, w, C).permute(
            0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if shift:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y


class TorchTinySwin(nn.Module):
    """Single-stage Swin, original-repo key layout; forward NHWC->NHWC."""

    def __init__(self, dim=16, depth=2, heads=2, window=4):
        super().__init__()
        self.patch_embed = nn.Sequential()
        self.patch_embed.proj = nn.Conv2d(3, dim, 4, 4)
        self.patch_embed.norm = nn.LayerNorm(dim)
        self.layers = nn.ModuleList()
        stage = nn.Module()
        stage.blocks = nn.ModuleList(
            [TorchSwinBlock(dim, heads, window,
                            0 if i % 2 == 0 else window // 2)
             for i in range(depth)])
        self.layers.append(stage)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        x = self.patch_embed.proj(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for blk in self.layers[0].blocks:
            x = blk(x)
        return self.norm(x)


class TorchChannelMapper(nn.Module):
    """mmdet ChannelMapper key layout (convs.{i}.conv/gn, extra_convs)."""

    def __init__(self, in_chs, out_ch, extra=1, groups=8):
        super().__init__()

        def block(cin, k, s):
            m = nn.Module()
            m.conv = nn.Conv2d(cin, out_ch, k, s, k // 2, bias=False)
            m.gn = nn.GroupNorm(groups, out_ch)
            return m

        self.convs = nn.ModuleList([block(c, 1, 1) for c in in_chs])
        self.extra_convs = nn.ModuleList(
            [block(in_chs[-1] if j == 0 else out_ch, 3, 2)
             for j in range(extra)])

    def forward(self, feats):
        outs = [m.gn(m.conv(f)) for m, f in zip(self.convs, feats)]
        src = feats[-1]
        for m in self.extra_convs:
            src = m.gn(m.conv(src))
            outs.append(src)
        return outs
