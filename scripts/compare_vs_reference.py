#!/usr/bin/env python
"""Compare fast_slic_tpu output against the freshly-built reference binary.

The reference core is compiled unmodified (in /tmp, outside the repo) by
scripts/build_ref_harness.sh; this script runs both pipelines on the same
inputs and reports label agreement.  Used to generate/refresh the pinned
agreement numbers in tests/test_golden.py.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, time, sys, subprocess
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from PIL import Image
from fast_slic_tpu import Slic

HARNESS = "/tmp/ref_harness/harness"

img = np.array(Image.open('/root/reference/test/data/fish.jpg'))
H, W = img.shape[:2]
img.astype(np.uint8).tofile('/tmp/ref_harness/fish.rgb')

for msf, tag in [(0.0, 'msf0'), (0.1, 'msf01')]:
    out_p = f'/tmp/ref_harness/fish_std_{tag}.u16'
    subprocess.run([HARNESS, '/tmp/ref_harness/fish.rgb', str(H), str(W),
                    '256', 'std', '10', str(msf), '3', '10', '1', out_p],
                   check=True)
    ref = np.fromfile(out_p, np.uint16).reshape(H, W).astype(np.int64)
    t0 = time.time()
    mine = Slic(num_components=256, min_size_factor=msf).iterate(img)
    print(tag, "mine run", round(time.time()-t0, 1), "s; agreement:",
          (mine == ref).mean(), "labels", mine.max()+1, ref.max()+1,
          flush=True)
print("DONE", flush=True)
