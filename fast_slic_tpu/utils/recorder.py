"""Debug recorder: per-iteration snapshots serialized to JSON.

Mirrors ``/root/reference/src/recorder.h``: when ``debug_mode`` is on, the
pipeline snapshots (assignment, min_dists, clusters) after initialization
(iteration -1) and after every iteration, and the report is surfaced as
``slic_model.last_recorder_report`` with the shape::

    {"height": H, "width": W, "snapshots": [
        {"iteration": i, "clusters": [...], "assignment": [...],
         "min_dists": [...]}, ...]}

The TPU pipeline collects the snapshots as stacked device arrays inside the
jit program (an unrolled scan), and this module renders them host-side.
"""

from __future__ import annotations

import io

import numpy as np


def _fmt(v) -> str:
    f = float(v)
    if f == int(f) and abs(f) < 1e15:
        return str(int(f))
    return repr(f)


def render_report(H, W, iterations, assignments, min_dists, clusters_seq) -> str:
    """iterations: list of ints; assignments/min_dists: [T, H, W] arrays;
    clusters_seq: list of Clusters (numpy)."""
    out = io.StringIO()
    out.write('{"height": %d, "width": %d, "snapshots": [' % (H, W))
    for t, it in enumerate(iterations):
        if t > 0:
            out.write(",")
        st = clusters_seq[t]
        out.write('{"iteration": %d, "clusters": [' % it)
        K = st.K
        for k in range(K):
            if k > 0:
                out.write(",")
            out.write(
                '{"yx": [%s,%s], "color": [%s,%s,%s], "is_updatable": %d, '
                '"is_active": %d, "number": %d, "num_members": %d}'
                % (_fmt(st.y[k]), _fmt(st.x[k]), _fmt(st.r[k]), _fmt(st.g[k]),
                   _fmt(st.b[k]), int(st.is_updatable[k]),
                   int(st.is_active[k]), k, int(st.num_members[k]))
            )
        out.write('], "assignment": [')
        out.write(",".join(map(str, np.asarray(assignments[t]).ravel().tolist())))
        out.write('], "min_dists": [')
        md = np.asarray(min_dists[t]).ravel()
        out.write(",".join(_fmt(v) for v in md.tolist()))
        out.write("]}")
    out.write("]}")
    return out.getvalue()
