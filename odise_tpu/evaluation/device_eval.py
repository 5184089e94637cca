"""On-device evaluation statistics: stream kilobytes, not tensors.

The reference evaluates on host CPU from full prediction tensors fetched off
the GPU (reference odise/evaluation/d2_evaluator.py + detectron2
postprocessing at maskformer_model.py:230-270); over PCIe that transfer is
free.  On TPU — and especially through a remote-relay device — it is not:
per-image semantic probabilities at open vocabularies are 0.5-3.4 GB.  The
TPU-native design computes every evaluator's *sufficient statistics* on
device and fetches only those:

* semantic mIoU     -> [K, K] confusion-matrix increments (accumulated on
                       device, flushed every few hundred images)
* panoptic PQ       -> [S_max+1, Q+1] gt x pred intersection-count matrix
* instance mask AP  -> [topk, M_max] intersection counts + areas

Post-processing parity: the reference resizes mask LOGITS bilinearly
(align_corners=False) to the original image size, then applies
semantic/panoptic/instance inference at that resolution
(maskformer_model.py:230-270, sem_seg_postprocess).  Here the resize is two
tent-kernel einsums against interpolation matrices built on device from
traced (h, w, oh, ow) scalars, so one compiled graph per (source-bucket,
output-grid) pair serves every image; fusion then runs on the resized
logits with ``valid_hw=(oh, ow)`` — identical semantics to the reference's
per-image original-resolution post-processing, with zero per-shape
recompiles.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "DeviceEvalRunner", "pick_grid", "resize_chw", "DEFAULT_GRIDS",
]

# output grids (original-resolution ladder); per image the smallest grid
# that fits (oh, ow) is used, so COCO (<=640px) compiles only the smallest
DEFAULT_GRIDS: Tuple[Tuple[int, int], ...] = (
    (768, 768), (1280, 1280), (2048, 2048))

# instance-GT count buckets (masks padded to the next bucket)
_M_BUCKETS = (16, 128)

# flush the device confusion accumulator before int32 can overflow
# (worst case one cell absorbs every pixel: 500 imgs * ~4.2M px < 2^31)
_CONF_FLUSH_EVERY = 500


def pick_grid(oh: int, ow: int,
              grids: Sequence[Tuple[int, int]] = DEFAULT_GRIDS):
    for g in grids:
        if oh <= g[0] and ow <= g[1]:
            return g
    return None  # larger than every grid: caller falls back to host path


def _pick_m_bucket(m: int) -> int:
    for b in _M_BUCKETS:
        if m <= b:
            return b
    return _M_BUCKETS[-1]


def _tent_matrix(out_pad: int, in_pad: int, out_len, in_len):
    """[out_pad, in_pad] bilinear (align_corners=False) weight matrix.

    ``out_len`` / ``in_len`` are traced scalars: the matrix is built on
    device, so one graph serves every (oh, ow) pair.  Rows >= out_len and
    columns >= in_len carry zero weight.
    """
    import jax.numpy as jnp

    i = jnp.arange(out_pad, dtype=jnp.float32)
    in_f = jnp.asarray(in_len, jnp.float32)
    out_f = jnp.asarray(out_len, jnp.float32)
    y = jnp.clip((i + 0.5) * (in_f / out_f) - 0.5, 0.0, in_f - 1.0)
    j = jnp.arange(in_pad, dtype=jnp.float32)
    a = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - j[None, :]))
    a = a * (i[:, None] < out_len) * (j[None, :] < in_len)
    return a


def resize_chw(x, src_hw, dst_hw, out_shape: Tuple[int, int]):
    """[C, H, W] -> [C, OH, OW] bilinear resize of the (src_hw) content
    region to the (dst_hw) content region of a static (OH, OW) grid."""
    import jax.numpy as jnp

    h, w = src_hw
    oh, ow = dst_hw
    a = _tent_matrix(out_shape[0], x.shape[1], oh, h)
    b = _tent_matrix(out_shape[1], x.shape[2], ow, w)
    y = jnp.einsum("ih,chw->ciw", a, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return jnp.einsum("jw,ciw->cij", b, y,
                      preferred_element_type=jnp.float32)


def _grid_valid(out_shape, dst_hw):
    import jax.numpy as jnp

    oh, ow = dst_hw
    return ((jnp.arange(out_shape[0])[:, None] < oh)
            & (jnp.arange(out_shape[1])[None, :] < ow))


def _sem_labels(mask_cls, masks_resized, k_chunk: int = 128):
    """argmax_k of semantic probs (softmax-class x sigmoid-mask blend) at
    grid resolution, chunked over classes so [K, OH, OW] never materializes
    (K=847 at a 2048^2 grid would be 11 GB)."""
    import jax
    import jax.numpy as jnp

    q, k1 = mask_cls.shape
    k = k1 - 1
    cls_prob = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]  # [Q, K]
    mask_prob = jax.nn.sigmoid(masks_resized)             # [Q, OH, OW]
    oh, ow = mask_prob.shape[1:]
    flat = mask_prob.reshape(q, oh * ow)

    pad_k = -k % k_chunk
    cls_pad = jnp.pad(cls_prob, ((0, 0), (0, pad_k)))
    n_chunks = (k + pad_k) // k_chunk
    chunks = cls_pad.T.reshape(n_chunks, k_chunk, q)

    def body(carry, ck):
        best, arg, base = carry
        probs = jnp.einsum("kq,qn->kn", ck, flat,
                           preferred_element_type=jnp.float32)
        m = jnp.max(probs, axis=0)
        a = jnp.argmax(probs, axis=0).astype(jnp.int32) + base
        take = m > best
        return (jnp.where(take, m, best), jnp.where(take, a, arg),
                base + k_chunk), None

    best0 = jnp.full((oh * ow,), -jnp.inf, jnp.float32)
    arg0 = jnp.zeros((oh * ow,), jnp.int32)
    (best, arg, _), _ = jax.lax.scan(body, (best0, arg0, jnp.int32(0)), chunks)
    return jnp.minimum(arg, k - 1).reshape(oh, ow)


class DeviceEvalRunner:
    """Per-task device evaluator: jit cache over (src, grid, gt buckets).

    One ``process`` call per image computes every enabled statistic on
    device from the model's (mask_cls, mask_pred) at source-bucket
    resolution, and returns small numpy arrays (plus keeps the semantic
    confusion matrix on device between flushes).
    """

    def __init__(self, *, num_classes: int, thing_mask: np.ndarray,
                 object_mask_threshold: float, overlap_threshold: float,
                 topk: int, ignore_label: int = 255,
                 semantic_on=True, panoptic_on=True, instance_on=True,
                 s_max: int = 256,
                 grids: Sequence[Tuple[int, int]] = DEFAULT_GRIDS):
        import jax.numpy as jnp

        self.K = num_classes
        self.thing_mask = jnp.asarray(thing_mask, bool)
        self.object_mask_threshold = float(object_mask_threshold)
        self.overlap_threshold = float(overlap_threshold)
        self.topk = int(topk)
        self.ignore_label = int(ignore_label)
        self.semantic_on = semantic_on
        self.panoptic_on = panoptic_on
        self.instance_on = instance_on
        self.s_max = int(s_max)
        self.grids = tuple(tuple(g) for g in grids)
        self._conf = None       # device [K, K] i32
        self._conf_host = np.zeros((self.K, self.K), np.int64)
        self._conf_n = 0
        self._jit_cache: Dict[tuple, object] = {}

    # -- jitted kernel ----------------------------------------------------

    def _blob_layout(self, grid, has_sem, has_pan, has_inst, m_pad):
        """Byte offsets of each gt array inside the single upload blob.

        One packed uint8 upload per image instead of one transfer per
        array: each host->device (and device->host) call pays the relay
        round-trip, which at ~25-30 ms dominates the actual bytes.
        """
        gh, gw = grid
        off = {}
        pos = 0
        if has_sem:
            off["sem"] = (pos, gh * gw * 2)  # uint16: labels <= 65535
            pos += gh * gw * 2
        if has_pan:
            off["pan"] = (pos, gh * gw * 4)
            pos += gh * gw * 4
            off["lut"] = (pos, self.s_max * 4)
            pos += self.s_max * 4
        if has_inst:
            nb = (gh * gw + 7) // 8
            off["bits"] = (pos, m_pad * nb)
            pos += m_pad * nb
        off["total"] = pos
        return off

    def _kernel(self, grid, has_sem: bool, has_pan: bool, has_inst: bool,
                m_pad: int):
        key = (grid, has_sem, has_pan, has_inst, m_pad)
        fn = self._jit_cache.get(key)
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        from ..models.inference import instance_inference, panoptic_inference

        K = self.K
        s_max = self.s_max
        ignore = self.ignore_label
        thing_mask = self.thing_mask
        obj_thr = self.object_mask_threshold
        ovl_thr = self.overlap_threshold
        topk = self.topk
        gh, gw = grid
        layout = self._blob_layout(grid, has_sem, has_pan, has_inst, m_pad)

        def _slice_as(blob, name, dtype, shape):
            start, nbytes = layout[name]
            raw = jax.lax.dynamic_slice(blob, (start,), (nbytes,))
            itemsize = jnp.dtype(dtype).itemsize
            out = jax.lax.bitcast_convert_type(
                raw.reshape(-1, itemsize), dtype)
            return out.reshape(shape)

        @functools.partial(jax.jit, donate_argnums=(1,))
        def run(args, conf):
            mask_cls, mask_pred, h, w, oh, ow, blob = args
            masks_r = resize_chw(mask_pred, (h, w), (oh, ow), grid)
            valid = _grid_valid(grid, (oh, ow))
            n = gh * gw

            out_parts = []  # packed int32 fetch (one transfer per image)

            if has_sem:
                sem_gt = _slice_as(blob, "sem", jnp.uint16,
                                   (gh, gw)).astype(jnp.int32)
                labels = _sem_labels(mask_cls, masks_r)
                gval = valid & (sem_gt != ignore) & (sem_gt < K)
                idx = (sem_gt.astype(jnp.int32) * K
                       + jnp.clip(labels, 0, K - 1))
                idx = jnp.where(gval, idx, K * K)  # drop bin
                inc = jnp.bincount(idx.reshape(-1), length=K * K + 1)
                conf = conf + inc[:-1].reshape(K, K).astype(jnp.int32)

            if has_pan:
                pan_gt = _slice_as(blob, "pan", jnp.uint32, (gh, gw))
                pan_lut = _slice_as(blob, "lut", jnp.uint32, (s_max,))
                pan = panoptic_inference(
                    mask_cls, masks_r, thing_mask,
                    object_mask_threshold=obj_thr,
                    overlap_threshold=ovl_thr, valid_hw=(oh, ow))
                # gt ids -> row index via the sorted segment-id LUT
                # (row 0 = void / unknown id)
                pos = jnp.searchsorted(pan_lut, pan_gt)
                pos = jnp.clip(pos, 0, pan_lut.shape[0] - 1)
                hit = jnp.take(pan_lut, pos) == pan_gt
                gt_row = jnp.where(hit, pos + 1, 0).astype(jnp.int32)
                gt_row = jnp.where(valid, gt_row, 0)
                q1 = pan.segment_category.shape[0] + 1
                pred_col = jnp.where(valid, pan.panoptic_seg, 0)
                joint = gt_row * q1 + pred_col
                # pad pixels -> bin 0 = (void, void): harmless to PQ
                counts = jnp.bincount(
                    joint.reshape(-1), length=(s_max + 1) * q1)
                # subtract grid padding from the (void, void) cell so areas
                # reflect the true image only
                counts = counts.at[0].add(-(n - oh * ow))
                out_parts += [counts.astype(jnp.int32),
                              pan.segment_category,
                              pan.segment_isthing.astype(jnp.int32),
                              pan.num_segments.reshape(1)]

            if has_inst:
                inst_bits = _slice_as(
                    blob, "bits", jnp.uint8, (m_pad, (n + 7) // 8))
                inst = instance_inference(
                    mask_cls, masks_r, thing_mask, topk=topk,
                    valid_hw=(oh, ow))
                det = inst.masks.reshape(inst.masks.shape[0], n)
                det = det.astype(jnp.bfloat16)
                # unpack little-endian packed gt bits -> [M, N]
                bits = ((inst_bits[:, :, None]
                         >> jnp.arange(8, dtype=jnp.uint8)) & 1)
                gt = bits.reshape(m_pad, -1)[:, :n].astype(jnp.bfloat16)
                gt = gt * valid.reshape(1, n).astype(jnp.bfloat16)
                inter = jnp.einsum("dn,mn->dm", det, gt,
                                   preferred_element_type=jnp.float32)
                dt_area = jnp.sum(det.astype(jnp.float32), axis=1)
                gt_area = jnp.sum(gt.astype(jnp.float32), axis=1)
                bits32 = lambda x: jax.lax.bitcast_convert_type(  # noqa: E731
                    x.astype(jnp.float32), jnp.int32)
                out_parts += [bits32(inst.scores),
                              inst.classes,
                              bits32(inter).reshape(-1),
                              bits32(dt_area), bits32(gt_area)]

            blob_out = (jnp.concatenate([p.reshape(-1) for p in out_parts])
                        if out_parts else jnp.zeros((1,), jnp.int32))
            return conf, blob_out

        self._jit_cache[key] = run
        return run

    # -- host API ---------------------------------------------------------

    def process(self, mask_cls, mask_pred, src_hw: Tuple[int, int],
                orig_hw: Tuple[int, int],
                sem_gt: Optional[np.ndarray] = None,
                pan_gt_ids: Optional[np.ndarray] = None,
                pan_seg_ids: Optional[np.ndarray] = None,
                inst_gt_masks: Optional[np.ndarray] = None) -> Optional[dict]:
        """One image.  Returns a dict of host-side stats, or None when the
        image does not fit the device path — original size beyond every
        grid, more than ``s_max`` panoptic gt segments, or more than the
        largest instance bucket — in which case the caller should use the
        host-postprocessing path.

        mask_cls [Q, K+1], mask_pred [Q, H, W] — on device, bucket padded.
        sem_gt [oh, ow] int — semantic gt (original resolution).
        pan_gt_ids [oh, ow] uint32 — panoptic gt id map (rgb2id output).
        pan_seg_ids [S] — gt segment ids present (any order).
        inst_gt_masks [M, oh, ow] bool — instance gt masks.
        """
        import jax
        import jax.numpy as jnp

        oh, ow = orig_hw
        grid = pick_grid(oh, ow, self.grids)
        if grid is None:
            return None
        if pan_gt_ids is not None and pan_seg_ids is not None \
                and len(pan_seg_ids) > self.s_max:
            return None  # crowded image: host fallback
        if inst_gt_masks is not None and len(inst_gt_masks) > _M_BUCKETS[-1]:
            return None  # too many gt instances: host fallback
        gh, gw = grid
        K = self.K

        if self._conf is None:
            self._conf = jnp.zeros((K, K), jnp.int32)

        has_sem = self.semantic_on and sem_gt is not None
        has_pan = self.panoptic_on and pan_gt_ids is not None
        has_inst = self.instance_on and inst_gt_masks is not None
        if not (has_sem or has_pan or has_inst):
            return {}

        # --- host-side gt packing (uploads are cheap; fetches are not) ---
        if has_sem:
            sg = np.full((gh, gw), self.ignore_label, np.uint16)
            sg[:oh, :ow] = np.asarray(sem_gt).astype(np.uint16)
        else:
            sg = np.zeros((1, 1), np.uint16)

        if has_pan:
            pg = np.zeros((gh, gw), np.uint32)
            pg[:oh, :ow] = np.asarray(pan_gt_ids, np.uint32)
            lut = np.sort(np.asarray(pan_seg_ids, np.uint32))
            s = len(lut)
            if s > self.s_max:
                raise ValueError(f"{s} gt segments > s_max={self.s_max}")
            # pad with a sentinel no real id matches
            lut_pad = np.full((self.s_max,), np.uint32(0xFFFFFFFF))
            lut_pad[:s] = lut
        else:
            pg = np.zeros((1, 1), np.uint32)
            lut_pad = np.zeros((1,), np.uint32)
            lut = np.zeros((0,), np.uint32)

        if has_inst:
            m = len(inst_gt_masks)
            m_pad = _pick_m_bucket(max(m, 1))
            if m > m_pad:
                raise ValueError(f"{m} gt instances > {m_pad}")
            flat = np.zeros((m_pad, gh * gw), bool)
            if m:
                padded = np.zeros((m, gh, gw), bool)
                padded[:, :oh, :ow] = inst_gt_masks
                flat[:m] = padded.reshape(m, -1)
            packed = np.packbits(flat, axis=1, bitorder="little")
        else:
            m = 0
            m_pad = 1
            packed = np.zeros((1, (gh * gw + 7) // 8), np.uint8)

        # one packed upload per image (per-transfer relay RTT dominates)
        layout = self._blob_layout(grid, has_sem, has_pan, has_inst, m_pad)
        blob = np.zeros((max(layout["total"], 1),), np.uint8)
        if has_sem:
            s0, nb = layout["sem"]
            blob[s0:s0 + nb] = sg.reshape(-1).view(np.uint8)
        if has_pan:
            s0, nb = layout["pan"]
            blob[s0:s0 + nb] = pg.reshape(-1).view(np.uint8)
            s0, nb = layout["lut"]
            blob[s0:s0 + nb] = lut_pad.view(np.uint8)
        if has_inst:
            s0, nb = layout["bits"]
            blob[s0:s0 + nb] = packed.reshape(-1)

        run = self._kernel(grid, has_sem, has_pan, has_inst, m_pad)
        args = (mask_cls, mask_pred,
                jnp.int32(src_hw[0]), jnp.int32(src_hw[1]),
                jnp.int32(oh), jnp.int32(ow), jnp.asarray(blob))
        self._conf, blob_out = run(args, self._conf)
        self._conf_n += 1
        if self._conf_n >= _CONF_FLUSH_EVERY:
            self.flush_confusion()

        words = np.asarray(blob_out)  # ONE fetch per image
        q = int(mask_cls.shape[0])
        t = min(self.topk, q * K)
        pos = 0

        def take(count):
            nonlocal pos
            out = words[pos: pos + count]
            pos += count
            return out

        res: dict = {}
        if has_pan:
            q1 = q + 1
            counts = take((self.s_max + 1) * q1).reshape(self.s_max + 1, q1)
            res["pan_counts"] = counts[: len(lut) + 1]
            res["pan_segment_category"] = take(q)
            res["pan_segment_isthing"] = take(q).astype(bool)
            res["pan_num_segments"] = int(take(1)[0])
            res["pan_gt_ids_sorted"] = lut
        if has_inst:
            res["inst_scores"] = take(t).view(np.float32)
            res["inst_classes"] = take(t)
            res["inst_inter"] = (take(t * m_pad).view(np.float32)
                                 .reshape(t, m_pad)[:, :m].astype(np.float64))
            res["inst_dt_area"] = take(t).view(np.float32).astype(np.float64)
            res["inst_gt_area"] = (take(m_pad).view(np.float32)
                                   .astype(np.float64)[:m])
        return res

    def reset(self):
        """Clear accumulated statistics (keeps the compiled-kernel cache —
        periodic in-training eval reuses the graphs across ticks)."""
        self._conf = None
        self._conf_host = np.zeros((self.K, self.K), np.int64)
        self._conf_n = 0

    def flush_confusion(self) -> np.ndarray:
        """Move the device confusion accumulator into the host total and
        return the running host matrix [K, K] int64."""
        import jax.numpy as jnp

        if self._conf is not None and self._conf_n:
            self._conf_host += np.asarray(self._conf, np.int64)
            self._conf = jnp.zeros((self.K, self.K), jnp.int32)
            self._conf_n = 0
        return self._conf_host
