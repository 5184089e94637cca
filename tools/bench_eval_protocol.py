"""Time the full eval protocol per image on the real chip:
infer (1024 bucket) + device stats (sem+pan+inst) + gt uploads + count fetches."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from odise_tpu.model_zoo.factory import build_category_odise
from odise_tpu.evaluation.device_eval import DeviceEvalRunner

K = 133
labels = tuple((f"category {i}",) for i in range(K))
model = build_category_odise("full", train_labels=labels, with_clip_head=True,
                             use_checkpoint=False, slide_training=False,
                             dtype=jnp.bfloat16)
S = 1024
img = jnp.zeros((1, S, S, 3), jnp.float32)
text_raw = jnp.zeros((K, 768), jnp.float32)
clip_text = jnp.zeros((K, 768), jnp.float32)
overlap = jnp.zeros((K,), jnp.int32)
thing = np.array([True] * 80 + [False] * (K - 80))

def init_fn():
    return model.init(jax.random.PRNGKey(0), img, text_raw, labels,
                      clip_text, labels, overlap, method=type(model).forward_eval)
shapes = jax.eval_shape(init_fn)
variables = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

@jax.jit
def infer(variables, img, text_raw, clip_text, overlap):
    return model.apply(variables, img, text_raw, labels, clip_text, labels,
                       overlap, method=type(model).forward_eval)

runner = DeviceEvalRunner(num_classes=K, thing_mask=thing,
                          object_mask_threshold=0.0, overlap_threshold=0.8,
                          topk=100, ignore_label=255)
oh, ow = 640, 480
rng = np.random.RandomState(0)
sem_gt = rng.randint(0, K, (oh, ow)).astype(np.int32)
gt_ids = (rng.randint(0, 12, (oh, ow)) + 1).astype(np.uint32)
seg_ids = np.arange(1, 13, dtype=np.uint32)
inst_gt = np.stack([gt_ids == i for i in range(1, 9)])

t0 = time.perf_counter()
mc, mp = infer(variables, img, text_raw, clip_text, overlap)
stats = runner.process(mc[0], mp[0], (S, S), (oh, ow), sem_gt=sem_gt,
                       pan_gt_ids=gt_ids, pan_seg_ids=seg_ids,
                       inst_gt_masks=inst_gt)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

for it in range(6):
    t0 = time.perf_counter()
    mc, mp = infer(variables, img, text_raw, clip_text, overlap)
    t1 = time.perf_counter()
    stats = runner.process(mc[0], mp[0], (S, S), (oh, ow), sem_gt=sem_gt,
                          pan_gt_ids=gt_ids, pan_seg_ids=seg_ids,
                          inst_gt_masks=inst_gt)
    t2 = time.perf_counter()
    print(f"iter {it}: infer-dispatch {t1-t0:.3f}s  stats {t2-t1:.3f}s  total {t2-t0:.3f}s", flush=True)
print("pan_counts sum", int(stats["pan_counts"].sum()), "expect", oh*ow)
