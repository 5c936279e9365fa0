"""SimpleCRF: temporal mean-field CRF over superpixel graphs, TPU-native.

API-parity re-implementation of the reference CRF
(``/root/reference/src/simple-crf.{h,hpp,cpp}``, Python face
``csimple_crf.pyx``).  The reference iterates python-ish triple loops over a
deque of frames; here the whole inference — message passing over the
superpixel adjacency, Potts compatibility transform, exp-normalize — runs as
one jitted program over stacked ``[T, C, N]`` tensors, so a batched video
stream never leaves HBM (BASELINE.md config 5).

Graph representation: dense neighbor-index matrix ``[N, D]`` padded with -1
(D = max degree; the SLIC adjacency is capped at 12 neighbors,
fast-slic.cpp:17).  Pairwise Gaussian energies are recomputed from cluster
features inside the program exactly like the reference
(simple-crf.hpp:135-174).
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np


class CRFParams:
    """Mirror of SimpleCRFParams with reference defaults (simple-crf.hpp:80-88)."""

    FIELDS = ("spatial_w", "temporal_w", "spatial_srgb", "temporal_srgb",
              "spatial_sxy", "spatial_smooth_w", "spatial_smooth_sxy")

    def __init__(self):
        self.spatial_w = 10.0
        self.temporal_w = 10.0
        self.spatial_srgb = 13.0
        self.temporal_srgb = 13.0
        self.spatial_sxy = 80.0
        self.spatial_smooth_w = 0.0
        self.spatial_smooth_sxy = 3.0

    def as_array(self):
        return np.array([getattr(self, f) for f in self.FIELDS], np.float32)


def _spatial_energy(c1, c2, p):
    """calc_spatial_pairwise_energy (simple-crf.hpp:149-174).

    c1, c2: [..., 6] (y, x, m, r, g, b) float32.  p: params array [7].
    """
    dy = (c1[..., 0] - c2[..., 0]) / p[4]
    dx = (c1[..., 1] - c2[..., 1]) / p[4]
    dr = (c1[..., 3] - c2[..., 3]) / p[2]
    dg = (c1[..., 4] - c2[..., 4]) / p[2]
    db = (c1[..., 5] - c2[..., 5]) / p[2]
    expo = -(dr * dr + dg * dg + db * db) / 2.0 - (dx * dx + dy * dy) / 2.0
    sdy = (c1[..., 0] - c2[..., 0]) / p[6]
    sdx = (c1[..., 1] - c2[..., 1]) / p[6]
    sexpo = -(sdx * sdx + sdy * sdy) / 2.0
    return p[0] * jnp.exp(expo) + p[5] * jnp.exp(sexpo)


def _temporal_energy(c1, c2, p):
    """calc_temporal_pairwise_energy (simple-crf.hpp:135-147)."""
    dr = (c1[..., 3] - c2[..., 3]) / p[3]
    dg = (c1[..., 4] - c2[..., 4]) / p[3]
    db = (c1[..., 5] - c2[..., 5]) / p[3]
    return p[1] * jnp.exp(-(dr * dr + dg * dg + db * db) / 2.0)


@functools.lru_cache(maxsize=32)
def _compiled_energies(T: int, N: int, D: int, params_key: tuple):
    """Jitted graph-energy staging: the densified weighted adjacency
    ``W [T, N, N]`` plus the temporal coupling vectors.  Split out of the
    mean-field solver so a streaming caller pays its scatter-add cost ONCE
    per graph (it only changes when a frame's features/connectivity/params
    change), not once per ``inference()`` call.  Params ride as compile-time
    constants: they change rarely and each runtime arg handle costs dispatch
    round-trip time on a remote-attached device."""
    params = jnp.asarray(np.array(params_key, np.float32))

    def run(yxmrgb, nbr):
        # yxmrgb: [T, N, 6]; nbr: [T, N, D] (-1 pad)
        valid = nbr >= 0
        safe = jnp.where(valid, nbr, 0)

        m = yxmrgb[..., 2]                                   # [T, N]
        m_center = jnp.maximum(m, 1.0)                       # <=0 -> 1
        # gather neighbor cluster rows: [T, N, D, 6]
        nbr_feat = jax.vmap(lambda f, s: f[s])(yxmrgb, safe)
        center = yxmrgb[:, :, None, :]                       # [T, N, 1, 6]
        e_s = _spatial_energy(nbr_feat, center, params)      # [T, N, D]
        # self-pairs contribute 0 (node_i == node_j guard, hpp:150)
        e_s = jnp.where(valid & (safe != jnp.arange(N)[None, :, None]), e_s, 0.0)
        m_nbr = jax.vmap(lambda mm, s: mm[s])(m, safe)       # [T, N, D]
        w_s = e_s * jnp.sqrt(m_nbr / m_center[:, :, None]) * valid

        # densify the weighted adjacency once: per-iteration neighbor
        # gathers execute serially on TPU, a [T, N, N] matmul does not
        t_idx = jnp.arange(T, dtype=jnp.int32)[:, None, None]
        i_idx = jnp.arange(N, dtype=jnp.int32)[None, :, None]
        W = jnp.zeros((T, N, N), jnp.float32).at[
            jnp.broadcast_to(t_idx, nbr.shape),
            jnp.broadcast_to(i_idx, nbr.shape),
            safe,
        ].add(jnp.where(valid, w_s, 0.0))

        # temporal energies between consecutive frames: e_t[t] couples t,t-1
        if T > 1:
            e_t = _temporal_energy(yxmrgb[1:], yxmrgb[:-1], params)  # [T-1, N]
            w_prev = e_t * jnp.sqrt(m[:-1] / m_center[1:])    # into frame t
            w_next = e_t * jnp.sqrt(m[1:] / m_center[:-1])    # into frame t-1
        else:
            # T == 1 has no temporal coupling; zero-size placeholders keep
            # the mean-field signature uniform
            w_prev = w_next = jnp.zeros((0, N), jnp.float32)
        return W, w_prev, w_next

    return jax.jit(run)


@functools.lru_cache(maxsize=32)
def _compiled_meanfield(T: int, C: int, N: int, from_unaries: bool,
                        compat_key: tuple, max_iter: int):
    """Jitted mean-field loop over pre-staged energies (N x infer_once,
    simple-crf.cpp:62-151).  compat/max_iter are compile-time constants
    (see _compiled_energies for why).

    With ``from_unaries`` the initial q = exp(-unary) (SimpleCRF::initialize,
    simple-crf.cpp:153-157) is computed IN-GRAPH, so a streaming caller that
    just did ``initialize(); inference(n)`` uploads nothing: unaries/graph
    are device-cached and posteriors stay on device until someone asks."""
    compat = jnp.asarray(np.array(compat_key, np.float32))

    def body_factory(unaries, W, w_prev, w_next):
        def body(_, q):
            msg = jnp.einsum("tij,tcj->tci", W, q,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
            if T > 1:
                msg = msg.at[1:].add(w_prev[:, None, :] * q[:-1])
                msg = msg.at[:-1].add(w_next[:, None, :] * q[1:])
            # Potts compatibility transform (simple-crf.cpp:105-114)
            cm = compat[None, :, None] * msg
            gathered = jnp.sum(cm, axis=1, keepdims=True) - cm
            new_q = jnp.exp(-(unaries + gathered))
            sums = jnp.maximum(jnp.sum(new_q, axis=1, keepdims=True), 1e-5)
            return new_q / sums
        return body

    if from_unaries:
        def run(unaries, W, w_prev, w_next):
            q = jnp.exp(-unaries)
            return jax.lax.fori_loop(
                0, max_iter, body_factory(unaries, W, w_prev, w_next), q)
    else:
        def run(q, unaries, W, w_prev, w_next):
            return jax.lax.fori_loop(
                0, max_iter, body_factory(unaries, W, w_prev, w_next), q)

    return jax.jit(run)


class SimpleCRFFrame:
    """One time-frame: cluster features, adjacency, unaries, inferred q.

    State lives in numpy on the host between calls; inference stacks all
    frames onto the device (csimple_crf.pyx:66-239 API surface).
    """

    def __init__(self, parent_crf, time):
        self.parent_crf = parent_crf  # keeps the CRF alive (GC parity)
        self.time = time
        C, N = parent_crf.num_classes, parent_crf.num_nodes
        self.num_classes = C
        self.num_nodes = N
        self._yxmrgb = np.zeros([N, 6], np.float32)
        self._yxmrgb[:, 2] = 1.0  # num_members = 1 (simple-crf.hpp:30-32)
        self._nbr = np.full([N, 1], -1, np.int32)   # padded neighbor matrix
        self._lens = np.zeros([N], np.int64)
        self._unaries = np.zeros([C, N], np.float32)
        # posterior state: "host" (in self._q), "device" (a slice of a
        # [T, C, N] stack left on device by inference()), or "unary"
        # (implied q = exp(-unary), reset_inferred not yet materialized)
        self._q = np.zeros([C, N], np.float32)
        self._q_mode = "host"
        self._q_stack = None   # (device stack, index) when mode == "device"

    # -- cluster features ----------------------------------------------------

    def _invalidate(self):
        if self.parent_crf is not None:
            self.parent_crf._cache = None

    def set_yxmrgb(self, yxmrgb):
        self._invalidate()
        arr = np.asarray(yxmrgb)
        if arr.shape[0] != self.num_nodes:
            raise ValueError(
                "Expected the first dimension of yxmrgb to equal to {}".format(
                    self.num_nodes))
        if arr.shape[1] != 6:
            raise ValueError(
                "Expected the second dimension of yxmrgb to equal to 6")
        # int32 truncation of inputs, then float storage (csimple_crf.pyx:111-121)
        self._yxmrgb = arr.astype(np.int32).astype(np.float32)

    def get_yxmrgb(self):
        return self._yxmrgb.tolist()

    # -- connectivity --------------------------------------------------------

    def set_connectivity(self, connectivity):
        self._invalidate()
        if hasattr(connectivity, "matrix"):
            nbr, lens = connectivity.matrix()
            if nbr.shape[0] != self.num_nodes:
                raise ValueError("Expected len(connectivity) to be {}".format(
                    self.num_nodes))
            self._nbr = nbr
            self._lens = lens
            return
        lists = (connectivity.tolist()
                 if hasattr(connectivity, "tolist") else connectivity)
        if len(lists) != self.num_nodes:
            raise ValueError("Expected len(connectivity) to be {}".format(
                self.num_nodes))
        from ..ops.graph import NodeConnectivity
        self._nbr, self._lens = NodeConnectivity(lists).matrix()

    def get_connectivity(self):
        return [self._nbr[i, :self._lens[i]].tolist()
                for i in range(self.num_nodes)]

    def connected_nodes(self, node):
        return self._nbr[node, :self._lens[node]].tolist()

    # -- unaries (simple-crf.cpp:34-55) --------------------------------------

    @property
    def unaries(self):
        return self._unaries.copy()

    @unaries.setter
    def unaries(self, new_value):
        self._invalidate()
        self._check_dimension(new_value)
        self._unaries = np.array(new_value, np.float32)

    def set_unbiased(self):
        self._invalidate()
        self._unaries[:] = np.log(np.float32(self.num_classes))

    def set_mask(self, classes, confidence):
        classes = np.asarray(classes)
        if classes.shape[0] != self.num_nodes:
            raise ValueError(
                "The dimension of class array should match the number of "
                "nodes {}".format(self.num_nodes))
        C = self.num_classes
        lowest = 1.0 / C
        active_p = lowest + (1 - lowest) * confidence
        inactive_p = (1 - active_p) / (C - 1)
        self._invalidate()
        self._unaries[:] = -np.log(np.float32(inactive_p))
        self._unaries[classes, np.arange(self.num_nodes)] = -np.log(
            np.float32(active_p))

    def set_proba(self, proba):
        self._invalidate()
        self._check_dimension(proba)
        self._unaries = -np.log(np.asarray(proba, np.float32))

    def get_unary(self):
        return self._unaries.copy()

    # -- state ---------------------------------------------------------------

    def reset_inferred(self):
        # lazy: inference() computes exp(-unary) in-graph when every frame
        # is in this state, so a streaming initialize();inference() cycle
        # uploads nothing (simple-crf.cpp:153-157 semantics preserved)
        self._q_mode = "unary"
        self._q_stack = None

    def _materialize_q(self):
        if self._q_mode == "unary":
            self._q = np.exp(-self._unaries)
        elif self._q_mode == "device":
            stack, idx = self._q_stack
            self._q = self.parent_crf._download_stack(stack)[idx].copy()
        self._q_mode = "host"
        self._q_stack = None
        return self._q

    def get_inferred(self):
        return self._materialize_q().copy()

    def normalize(self):
        q = self._materialize_q()
        s = q.sum(axis=0, keepdims=True)
        self._q = q / s

    # -- pairwise energies (host-side singles for API parity) ----------------

    def spatial_pairwise_energy(self, node_i, node_j):
        if node_i >= self.num_nodes or node_j >= self.num_nodes:
            raise ValueError("node number is out of range")
        if node_i == node_j:
            return 0.0
        p = self.parent_crf.params.as_array()
        return float(_spatial_energy(
            jnp.asarray(self._yxmrgb[node_i]),
            jnp.asarray(self._yxmrgb[node_j]), jnp.asarray(p)))

    def temporal_pairwise_energy(self, node_i, other):
        if not isinstance(other, SimpleCRFFrame):
            raise TypeError("not a crf frame")
        if node_i >= self.num_nodes:
            raise ValueError("node number is out of range")
        if other is self:
            return 0.0
        p = self.parent_crf.params.as_array()
        return float(_temporal_energy(
            jnp.asarray(self._yxmrgb[node_i]),
            jnp.asarray(other._yxmrgb[node_i]), jnp.asarray(p)))

    @property
    def space_size(self):
        return self.num_classes * self.num_nodes

    def _check_dimension(self, arr):
        arr = np.asarray(arr)
        if arr.shape[0] != self.num_classes:
            raise ValueError(
                "The first dimension of array should match the number of "
                "classes {}".format(self.num_classes))
        if arr.shape[1] != self.num_nodes:
            raise ValueError(
                "The second dimension of array should match the number of "
                "nodes {}".format(self.num_nodes))


class SimpleCRF:
    """Deque of frames + params, with jitted batched inference
    (simple-crf.hpp:69-133)."""

    def __init__(self, num_classes, num_nodes):
        self.num_classes = int(num_classes)
        self.num_nodes = int(num_nodes)
        self.params = CRFParams()
        self.compat_by_class = np.ones([self.num_classes], np.float32)
        self._frames = OrderedDict()  # time -> frame
        self._next_time = 0
        self._cache = None  # device-side (nbr, yxmrgb, unaries) staging
        self._dl_cache = None  # (device stack, host copy) of posteriors
        self._energy_cache = None  # staged (W, w_prev, w_next) per graph+params

    # params as properties, mirroring csimple_crf.pyx:248-302
    def _param_prop(name):  # noqa: N805
        def get(self):
            return getattr(self.params, name)

        def set_(self, v):
            setattr(self.params, name, float(v))

        return property(get, set_)

    spatial_w = _param_prop("spatial_w")
    temporal_w = _param_prop("temporal_w")
    spatial_srgb = _param_prop("spatial_srgb")
    temporal_srgb = _param_prop("temporal_srgb")
    spatial_sxy = _param_prop("spatial_sxy")
    spatial_smooth_w = _param_prop("spatial_smooth_w")
    spatial_smooth_sxy = _param_prop("spatial_smooth_sxy")
    del _param_prop

    @property
    def first_time(self):
        return next(iter(self._frames), -1)

    @property
    def last_time(self):
        return next(reversed(self._frames), -1)

    @property
    def num_frames(self):
        return len(self._frames)

    @property
    def space_size(self):
        return self.num_classes * self.num_nodes

    def push_frame(self):
        self._cache = None
        t = self._next_time
        self._next_time += 1
        frame = SimpleCRFFrame(self, t)
        self._frames[t] = frame
        return frame

    def pop_frame(self):
        self._cache = None
        if not self._frames:
            return -1
        t, _ = self._frames.popitem(last=False)
        return t

    def get_frame(self, time):
        try:
            return self._frames[time]
        except KeyError:
            raise IndexError("Time out of range") from None

    def push_slic_frame(self, slic, knn=None):
        """Wire a Slic result into a new frame (csimple_crf.pyx:326-334)."""
        frame = self.push_frame()
        frame.set_yxmrgb(slic.slic_model.to_yxmrgb())
        if knn is None:
            frame.set_connectivity(
                slic.slic_model.get_connectivity(slic.last_assignment))
        else:
            frame.set_connectivity(
                slic.slic_model.get_knn_connectivity(slic.last_assignment, knn))
        frame.set_unbiased()
        return frame

    def initialize(self):
        for f in self._frames.values():
            f.reset_inferred()

    def _download_stack(self, stack):
        """Host copy of a device posterior stack, cached per stack object
        (one [T, C, N] device->host transfer no matter how many frames
        materialize from it)."""
        if self._dl_cache is None or self._dl_cache[0] is not stack:
            self._dl_cache = (stack, np.asarray(stack))
        return self._dl_cache[1]

    def inferred_stack(self):
        """Device-resident posteriors: the [T, C, N] jax array left on
        device by the last :meth:`inference`, or None if no inference ran
        (or a frame has since materialized/mutated its q on the host).

        A streaming pipeline that consumes posteriors on-device (e.g.
        feeding ``broadcast_density_to_mask``-style pooling or the next
        model stage) should read this instead of per-frame
        ``get_inferred()`` — the latter copies the whole stack to the host
        (672 KB for T=5, C=21, N=1600; a dispatch-blocking transfer on a
        remote-attached device), which the reference never has to pay
        because its buffers are host memory (csimple_crf.pyx:201-204)."""
        frames = list(self._frames.values())
        if not frames:
            return None
        f0 = frames[0]
        if f0._q_mode != "device" or f0._q_stack is None:
            return None
        stack = f0._q_stack[0]
        if all(f._q_mode == "device" and f._q_stack is not None
               and f._q_stack[0] is stack and f._q_stack[1] == t
               for t, f in enumerate(frames)):
            return stack
        return None

    def inference(self, max_iter):
        """Mean-field inference over all frames as ONE device program
        (N x infer_once, simple-crf.cpp:62-151).

        Device-resident streaming: graph/unary staging is cached until a
        frame mutates; the densified pairwise energies (the expensive
        scatter-add) are staged by their own jitted program and cached per
        (graph, params); posteriors live on device between calls (a repeat
        inference continues from the device stack, an initialize() is
        folded into the graph as exp(-unary)); nothing is copied back until
        some frame's get_inferred() asks.  Steady state, a
        ``initialize(); inference(n)`` cycle is ONE device dispatch with two
        input handles (unaries + the staged W) and one output."""
        if not self._frames:
            return
        frames = list(self._frames.values())
        T, C, N = len(frames), self.num_classes, self.num_nodes
        if self._cache is None:
            D = max(1, max(int(f._nbr.shape[1]) for f in frames))
            nbr = np.full([T, N, D], -1, np.int32)
            for t, f in enumerate(frames):
                nbr[t, :, : f._nbr.shape[1]] = f._nbr
            self._cache = (
                jnp.asarray(nbr),
                jnp.asarray(np.stack([f._yxmrgb for f in frames])),
                jnp.asarray(np.stack([f._unaries for f in frames])),
            )
        nbr_d, yxmrgb_d, unaries_d = self._cache

        params_key = tuple(float(v) for v in self.params.as_array())
        if (self._energy_cache is None
                or self._energy_cache[0] is not self._cache
                or self._energy_cache[1] != params_key):
            efn = _compiled_energies(T, N, int(nbr_d.shape[-1]), params_key)
            W, w_prev, w_next = efn(yxmrgb_d, nbr_d)
            self._energy_cache = (self._cache, params_key, W, w_prev, w_next)
        _, _, W, w_prev, w_next = self._energy_cache

        modes = {f._q_mode for f in frames}
        from_unaries = modes == {"unary"}
        compat_key = tuple(float(v) for v in self.compat_by_class)
        fn = _compiled_meanfield(T, C, N, from_unaries, compat_key,
                                 int(max_iter))
        if from_unaries:
            out = fn(unaries_d, W, w_prev, w_next)
        else:
            if modes == {"device"} and all(
                    f._q_stack is not None
                    and f._q_stack[0] is frames[0]._q_stack[0]
                    and f._q_stack[1] == t for t, f in enumerate(frames)):
                q_in = frames[0]._q_stack[0]  # continue from the device stack
            else:
                q_in = jnp.asarray(np.stack([f._materialize_q()
                                             for f in frames]))
            out = fn(q_in, unaries_d, W, w_prev, w_next)
        self._dl_cache = None
        for t, f in enumerate(frames):
            f._q_mode = "device"
            f._q_stack = (out, t)
