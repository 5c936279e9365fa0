"""TPU validation for the HIGH-precision (bf16_3x) selection matmuls in the
float assign kernel: labels of every float variant must be bit-identical to
the XLA oracle arch ON REAL TPU (interpret-mode tests cannot catch a Mosaic
precision regression).  Run after touching assign_tpu precision settings."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fast_slic_tpu import cluster as cl
from fast_slic_tpu import pipeline
from fast_slic_tpu.config import StaticConfig


def main():
    H, W, K = 192, 256, 64
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    z = np.load(os.path.join(here, "tests", "data", "golden_ref.npz"))
    from PIL import Image
    image = np.asarray(Image.fromarray(z["image"]).resize((W, H),
                                                          Image.BILINEAR))
    st = cl.initialize_clusters(image, K)
    ok = True
    for variant, tol in (("real", 1.0), ("real_l2", 1.0), ("real_noq", 1.0),
                         ("lsc", 0.999)):
        outs = {}
        for arch in ("pallas", "xla"):
            cfg = StaticConfig(H=H, W=W, K=K, arch=arch, variant=variant)
            scal = pipeline.derive_scalars(cfg, 10.0, 0.1, 0.05)
            fn = pipeline.compiled_iterate(cfg, 10, 3)
            out = fn(jnp.asarray(image), jax.tree.map(jnp.asarray, st), scal)
            outs[arch] = np.asarray(out.labels)
        agree = float((outs["pallas"] == outs["xla"]).mean())
        status = "OK" if agree >= tol else "FAIL"
        ok &= agree >= tol
        print(f"{variant:10s}: agreement {agree:.6f} (need >= {tol}) {status}",
              flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
