// Native host-side ops for the data/eval pipeline.
//
// The reference's native layer is a CUDA kernel for deformable attention
// (third_party/Mask2Former/.../ops/src); on TPU that op lives in XLA/Pallas.
// The host-side hot loops that remain — panoptic png id decoding, PQ
// intersection counting, and mask IoU — are implemented here in C++ and
// bound via ctypes (no pybind11 in the image). Each function operates on
// contiguous buffers handed over from numpy.
//
// Build: python setup_native.py  (or odise_tpu.native.build_native())

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// rgb [h*w*3] uint8 -> ids [h*w] uint32 (panopticapi convention)
void rgb2id(const uint8_t* rgb, uint32_t* ids, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = rgb + i * 3;
    ids[i] = (uint32_t)p[0] + 256u * (uint32_t)p[1] + 65536u * (uint32_t)p[2];
  }
}

// Count intersection areas of (gt, pred) id pairs over two uint32 maps.
// Outputs up to max_pairs triples (gt_id, pred_id, count) into out;
// returns the number of distinct pairs (may exceed max_pairs — caller
// should re-call with a bigger buffer; counts beyond max_pairs are dropped).
int64_t pq_intersections(const uint32_t* gt, const uint32_t* pred, int64_t n,
                         uint64_t* out_pairs, uint64_t* out_counts,
                         int64_t max_pairs) {
  std::unordered_map<uint64_t, uint64_t> acc;
  acc.reserve(1024);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t key = ((uint64_t)gt[i] << 32) | (uint64_t)pred[i];
    ++acc[key];
  }
  int64_t m = 0;
  for (const auto& kv : acc) {
    if (m < max_pairs) {
      out_pairs[m] = kv.first;
      out_counts[m] = kv.second;
    }
    ++m;
  }
  return m;
}

// IoU between two boolean masks given as uint8 arrays.
double mask_iou(const uint8_t* a, const uint8_t* b, int64_t n) {
  int64_t inter = 0, uni = 0;
  for (int64_t i = 0; i < n; ++i) {
    const bool av = a[i] != 0, bv = b[i] != 0;
    inter += (av && bv);
    uni += (av || bv);
  }
  return uni ? (double)inter / (double)uni : 0.0;
}

// Per-id pixel areas over a uint32 id map (ids < num_ids).
void bincount_u32(const uint32_t* ids, int64_t n, uint64_t* counts,
                  int64_t num_ids) {
  std::memset(counts, 0, sizeof(uint64_t) * num_ids);
  for (int64_t i = 0; i < n; ++i) {
    if (ids[i] < (uint32_t)num_ids) ++counts[ids[i]];
  }
}

}  // extern "C"
