"""Pure-numpy HDBSCAN* with GLOSH outlier scores — the real M5 kernel
(reference: samplers/outliers.py:42-47 uses the hdbscan library's
``HDBSCAN(...).fit`` + ``outlier_scores_``; no such library exists in
this environment, so the algorithm itself is implemented from the
published description: Campello, Moulavi, Sander 2013/2015 — density-
based clustering via the mutual-reachability MST, cluster extraction by
excess-of-mass, and GLOSH = (lambda_death(C(x)) - lambda(x)) /
lambda_death(C(x))).

Chunk-local by design: the DataFrame operator feeds <= max_chunk_size
rows per call (operators/outliers.py framing), so the O(n^2 d) Prim MST
runs blockless in vectorized numpy — at the production chunk of 20k
rows that is ~4 GFLOP per task, CPU-bound and memory-light (O(n) state;
distance rows are materialized one vertex at a time, never n x n).

Conventions (matching the hdbscan library where observable):
- core distance = distance to the ``min_samples``-th nearest neighbour
  in a self-inclusive query (i.e. the (min_samples-1)-th other point);
- lambda = 1 / mutual-reachability distance (duplicates give inf,
  clamped to the cluster death so scores stay in [0, 1]);
- excess-of-mass cluster selection, root never selected
  (allow_single_cluster=False), noise label -1.
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def core_distances(x: np.ndarray, min_samples: int) -> np.ndarray:
    """Self-inclusive k-NN core distance per row, blockwise."""
    n = len(x)
    k = min(min_samples, n)  # self counts, so k-1 other neighbours
    norms = np.einsum("ij,ij->i", x, x)
    out = np.empty(n)
    block = max(1, min(512, n))
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        d2 = norms[i0:i1, None] - 2.0 * (x[i0:i1] @ x.T) + norms[None, :]
        np.maximum(d2, 0.0, out=d2)
        part = np.partition(d2, k - 1, axis=1)[:, k - 1]
        out[i0:i1] = np.sqrt(part)
    return out


def mst_edges(x: np.ndarray, core: np.ndarray) -> np.ndarray:
    """Prim's MST over the complete mutual-reachability graph; returns
    (n-1, 3) [u, v, weight] rows. O(n) state: the candidate-edge array
    is updated with one exact distance row per added vertex."""
    n = len(x)
    if n < 2:
        return np.zeros((0, 3))
    norms = np.einsum("ij,ij->i", x, x)
    in_tree = np.zeros(n, bool)
    best = np.full(n, np.inf)
    best_from = np.zeros(n, np.int64)
    in_tree[0] = True
    cur = 0
    edges = np.empty((n - 1, 3))
    for i in range(n - 1):
        d2 = norms - 2.0 * (x @ x[cur]) + norms[cur]
        np.maximum(d2, 0.0, out=d2)
        mr = np.maximum(np.maximum(np.sqrt(d2), core), core[cur])
        upd = (~in_tree) & (mr < best)
        best[upd] = mr[upd]
        best_from[upd] = cur
        masked = np.where(in_tree, np.inf, best)
        nxt = int(masked.argmin())  # ties: lowest index, deterministic
        edges[i] = (best_from[nxt], nxt, best[nxt])
        in_tree[nxt] = True
        cur = nxt
    return edges


def single_linkage(edges: np.ndarray, n: int) -> np.ndarray:
    """Union-find dendrogram from sorted MST edges, scipy layout:
    row i = (left, right, dist, size) creating node n+i."""
    order = np.lexsort((edges[:, 1], edges[:, 0], edges[:, 2]))
    parent = np.arange(2 * n - 1, dtype=np.int64)
    size = np.ones(2 * n - 1, dtype=np.int64)
    out = np.empty((n - 1, 4))

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:  # path compression
            parent[a], a = root, parent[a]
        return root

    nxt = n
    for i, e in enumerate(order):
        u, v, w = edges[e]
        ru, rv = find(int(u)), find(int(v))
        out[i] = (min(ru, rv), max(ru, rv), w, size[ru] + size[rv])
        parent[ru] = parent[rv] = nxt
        size[nxt] = size[ru] + size[rv]
        nxt += 1
    return out


def condense_tree(linkage: np.ndarray, n: int, min_cluster_size: int):
    """Walk the dendrogram top-down, keeping only splits where BOTH
    sides reach ``min_cluster_size``. Returns per-point (cluster,
    lambda_p) and per-cluster (parent, birth, death, stability, size).
    Cluster 0 is the root; deaths are propagated over descendants (the
    GLOSH epsilon_max)."""
    left = linkage[:, 0].astype(np.int64)
    right = linkage[:, 1].astype(np.int64)
    lam = 1.0 / np.maximum(linkage[:, 2], _EPS)  # split lambda per node
    sizes = linkage[:, 3].astype(np.int64)

    def node_size(v: int) -> int:
        return 1 if v < n else int(sizes[v - n])

    def leaves(v: int) -> list[int]:
        out, stack = [], [v]
        while stack:
            u = stack.pop()
            if u < n:
                out.append(u)
            else:
                stack.extend((left[u - n], right[u - n]))
        return out

    point_cluster = np.zeros(n, np.int64)
    point_lambda = np.zeros(n)
    cl_parent = [-1]
    cl_birth = [0.0]
    cl_split_size = [0]  # members remaining at the cluster's final split
    cl_split_lambda = [0.0]
    cl_children: list[list[int]] = [[]]
    cl_fallen: list[list[int]] = [[]]  # point ids that fell out, per cluster

    root = 2 * n - 2
    stack = [(root, 0)]
    while stack:
        node, cl = stack.pop()
        if node < n:
            # a singleton still carrying the cluster: it exits at the
            # lambda of the edge that isolated it (recorded by parent)
            continue
        i = node - n
        l_node, r_node, l_lam = left[i], right[i], lam[i]
        sl, sr = node_size(l_node), node_size(r_node)
        if sl >= min_cluster_size and sr >= min_cluster_size:
            # true split: parent dies into two new clusters
            cl_split_size[cl] = sl + sr
            cl_split_lambda[cl] = l_lam
            for child in (l_node, r_node):
                cid = len(cl_parent)
                cl_parent.append(cl)
                cl_birth.append(l_lam)
                cl_split_size.append(0)
                cl_split_lambda.append(0.0)
                cl_children.append([])
                cl_fallen.append([])
                cl_children[cl].append(cid)
                stack.append((child, cid))
        else:
            for child, s in ((l_node, sl), (r_node, sr)):
                if s < min_cluster_size:
                    for p in leaves(child):
                        point_cluster[p] = cl
                        point_lambda[p] = l_lam
                    cl_fallen[cl].extend(leaves(child))
                else:
                    stack.append((child, cl))

    n_cl = len(cl_parent)
    birth = np.array(cl_birth)
    death = np.zeros(n_cl)
    stability = np.zeros(n_cl)
    for cl in range(n_cl):
        fall = cl_fallen[cl]
        if fall:
            death[cl] = max(point_lambda[p] for p in fall)
            stability[cl] = sum(
                min(point_lambda[p], np.inf) - birth[cl] for p in fall
            )
        if cl_split_size[cl]:
            death[cl] = max(death[cl], cl_split_lambda[cl])
            stability[cl] += cl_split_size[cl] * (
                cl_split_lambda[cl] - birth[cl]
            )
    # propagate deaths up (epsilon_max over the whole subtree)
    for cl in range(n_cl - 1, 0, -1):
        death[cl_parent[cl]] = max(death[cl_parent[cl]], death[cl])
    return (
        point_cluster,
        point_lambda,
        np.array(cl_parent),
        birth,
        death,
        stability,
        cl_children,
    )


def hdbscan_chunk(
    x: np.ndarray, min_samples: int = 5, min_cluster_size: int = 25
) -> tuple[np.ndarray, np.ndarray]:
    """(labels, glosh_scores) for one chunk. Labels are excess-of-mass
    clusters renumbered 0..k-1 in first-appearance order of the point
    stream (deterministic), noise -1; scores in [0, 1]."""
    n = len(x)
    if n < 2 or min_cluster_size < 2:
        return np.full(n, -1, np.int64), np.zeros(n)
    core = core_distances(x, min_samples)
    link = single_linkage(mst_edges(x, core), n)
    (
        point_cluster,
        point_lambda,
        parent,
        _birth,
        death,
        stability,
        children,
    ) = condense_tree(link, n, min_cluster_size)

    # GLOSH: (death(C(x)) - lambda(x)) / death(C(x)), clamped to [0, 1]
    d = death[point_cluster]
    with np.errstate(invalid="ignore", divide="ignore"):
        score = np.where(d > 0, (d - np.minimum(point_lambda, d)) / d, 0.0)

    # excess-of-mass selection, leaves upward; root (0) never selected
    n_cl = len(parent)
    subtree = np.zeros(n_cl)
    selected = np.zeros(n_cl, bool)
    for cl in range(n_cl - 1, 0, -1):
        ch_sum = sum(subtree[c] for c in children[cl])
        if not children[cl] or stability[cl] >= ch_sum:
            selected[cl] = True
            subtree[cl] = stability[cl]
        else:
            subtree[cl] = ch_sum
    # a cluster labels points only when no selected ancestor exists
    label_of = np.full(n_cl, -1, np.int64)
    for cl in range(1, n_cl):
        anc = parent[cl]
        shadowed = False
        while anc > 0:
            if selected[anc]:
                shadowed = True
                break
            anc = parent[anc]
        if selected[cl] and not shadowed:
            label_of[cl] = cl
    # points belong to the nearest labelled ancestor of their exit cluster
    labels = np.full(n, -1, np.int64)
    for p in range(n):
        cl = point_cluster[p]
        while cl >= 0:
            if label_of[cl] >= 0:
                labels[p] = label_of[cl]
                break
            cl = parent[cl]
    # renumber deterministically by first appearance in row order
    out = np.full(n, -1, np.int64)
    seen: dict[int, int] = {}
    for p in range(n):
        if labels[p] >= 0:
            if labels[p] not in seen:
                seen[labels[p]] = len(seen)
            out[p] = seen[labels[p]]
    return out, score
