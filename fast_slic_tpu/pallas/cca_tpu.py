"""Connected-components label propagation as a Pallas TPU kernel.

The CCA bottleneck is min-label propagation to fixpoint.  XLA formulations
are memory-bound at one neighbor hop per [H, W] pass (or fall off fast paths
entirely: pointer jumping needs million-entry gathers, associative_scan
lowers poorly), measured >1s for 720p.  This kernel keeps a strip of rows
resident in VMEM and performs *segmented doubling* there:

* horizontal: for t = 0..log2(W), each pixel absorbs the running min from
  2^t lanes away iff the whole span between them carries the same SLIC
  label.  The invariant pair (m, ok) — "min over the largest same-label
  span of length <= 2^t ending here" / "span is label-uniform" — makes the
  doubling exact; after log2(W) steps every pixel holds the min over its
  full row-run.  Both directions.
* vertical: the same doubling over the strip's rows (sublane rolls).
* one plain neighbor-min exchange against the 1-row halos couples strips;
  the outer while loop (in XLA) repeats passes until global fixpoint, so
  information crosses one strip per pass and spreads through it instantly.

For SLIC outputs (components bounded by the +-S window) a handful of passes
converge; adversarial mazes still terminate via the fixpoint loop.

Runs in interpret mode off-TPU so the same code path is unit-testable on
CPU (tests/test_cca.py compares against the union-find oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 0x7FFFFFFF  # python int: jnp constants close over device arrays in kernels


def _roll_masked(x, shift, axis, fill):
    """Shift x by `shift` along axis (positive = values move to higher
    indices), filling vacated positions with `fill`.  jnp.roll lowers to
    slice+concat in Mosaic and works in interpret mode."""
    rolled = jnp.roll(x, shift, axis=axis)
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if shift >= 0:
        mask = idx >= shift
    else:
        mask = idx < n + shift
    return jnp.where(mask, rolled, jnp.full_like(x, fill))


def _seg_doubling(m, lab, axis, reach=None):
    """Segmented min-doubling along `axis`, both directions.

    m: int32 running min (candidate component ids), lab: labels.
    Returns m where every element holds the min over its maximal
    equal-label run along the axis (up to `reach` elements away; the outer
    fixpoint loop covers longer runs).
    """
    n = m.shape[axis]
    if reach is not None:
        n = min(n, reach)
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))))
    for direction in (1, -1):
        cur = m
        # int32 flag (1 = span uniform): Mosaic cannot roll i1 vectors
        ok = jnp.ones(m.shape, dtype=jnp.int32)
        for t in range(steps):
            sh = direction * (1 << t)
            lab_sh = _roll_masked(lab, sh, axis, -2)
            cur_sh = _roll_masked(cur, sh, axis, _BIG)
            ok_sh = _roll_masked(ok, sh, axis, 0)
            cont = ok * (lab_sh == lab).astype(jnp.int32)
            cur = jnp.where(cont != 0, jnp.minimum(cur, cur_sh), cur)
            ok = cont * ok_sh
        m = jnp.minimum(m, cur)
    return m


def _neighbor_min_strip(m, lab):
    """One 4-neighbor min exchange inside the strip (diagonal coupling the
    axis-aligned doubling can miss converges faster with it)."""
    out = m
    for axis, sh in ((0, 1), (0, -1), (1, 1), (1, -1)):
        nl = _roll_masked(lab, sh, axis, -2)
        nm = _roll_masked(m, sh, axis, _BIG)
        out = jnp.minimum(out, jnp.where(nl == lab, nm, jnp.full_like(m, _BIG)))
    return out


def _cc_pass_kernel(lab_ref, labu_ref, labd_ref, m_ref, mu_ref, md_ref,
                    out_ref, *, reach):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    lab = lab_ref[:]
    m = m_ref[:]

    # halo exchange: one neighbor-min against the adjacent strips' edge rows
    # (halo blocks are 8 rows for TPU sublane alignment; only the edge row
    # of each matters)
    first = lab[0:1, :]
    up_lab = labu_ref[7:8, :]
    up_m = jnp.where((i > 0) & (up_lab == first), mu_ref[7:8, :],
                     jnp.full_like(first, _BIG))
    m = jnp.concatenate([jnp.minimum(m[0:1, :], up_m), m[1:, :]], axis=0)
    last = lab[-1:, :]
    dn_lab = labd_ref[0:1, :]
    dn_m = jnp.where((i < n - 1) & (dn_lab == last), md_ref[0:1, :],
                     jnp.full_like(last, _BIG))
    m = jnp.concatenate([m[:-1, :], jnp.minimum(m[-1:, :], dn_m)], axis=0)

    # in-strip propagation: one horizontal + one vertical doubling round
    # per pass (the outer fixpoint loop handles winding components), with
    # horizontal reach capped by the SLIC component diameter.
    m = _seg_doubling(m, lab, axis=1, reach=reach)
    m = _seg_doubling(m, lab, axis=0)
    m = _neighbor_min_strip(m, lab)
    out_ref[:] = m


@functools.partial(jax.jit, static_argnames=("strip", "interpret", "reach"))
def _cc_passes(labels, m, strip: int, interpret: bool, reach: int):
    Hp, W = labels.shape
    n_strips = Hp // strip

    sub = strip // 8  # strip in units of 8-row blocks

    def edge_spec(offset):
        # 8-row halo blocks (TPU sublane alignment); the kernel uses only
        # the row adjacent to the strip
        if offset < 0:
            return pl.BlockSpec(
                (8, W), lambda i: (jnp.maximum(i * sub - 1, 0), 0))
        return pl.BlockSpec(
            (8, W), lambda i: (jnp.minimum(i * sub + sub, Hp // 8 - 1), 0))

    strip_spec = pl.BlockSpec((strip, W), lambda i: (i, 0))
    return pl.pallas_call(
        functools.partial(_cc_pass_kernel, reach=reach),
        grid=(n_strips,),
        in_specs=[strip_spec, edge_spec(-1), edge_spec(+1),
                  strip_spec, edge_spec(-1), edge_spec(+1)],
        out_specs=strip_spec,
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.int32),
        interpret=interpret,
    )(labels, labels, labels, m, m, m)


def propagate_min_pallas(labels, m0, strip: int = 64,
                         interpret: bool | None = None,
                         reach: int | None = None):
    """Propagate the component-wise minimum of m0 over 4-connected
    equal-label regions to fixpoint.  labels, m0: [H, W] int32 (use _BIG-like
    large values in m0 for "no value here")."""
    H, W = labels.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if reach is None:
        reach = W
    Hp = -(-H // strip) * strip
    Wp = -(-W // 128) * 128
    lab_p = jnp.full((Hp, Wp), -7, jnp.int32)
    lab_p = lab_p.at[:H, :W].set(labels.astype(jnp.int32))
    m_p = jnp.full((Hp, Wp), _BIG, jnp.int32).at[:H, :W].set(m0)

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        m, _ = carry
        m2 = _cc_passes(lab_p, m, strip, interpret, reach)
        return m2, jnp.any(m2 != m)

    m, _ = jax.lax.while_loop(cond, body, (m_p, jnp.bool_(True)))
    return m[:H, :W]


def connected_components_pallas(labels, strip: int = 64,
                                interpret: bool | None = None,
                                reach: int | None = None):
    """[H, W] labels -> [H, W] component ids (min linear pixel index)."""
    H, W = labels.shape
    iota = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
            + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    return propagate_min_pallas(labels, iota, strip, interpret, reach)
