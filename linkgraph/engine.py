"""BSP superstep engine: partition-pinned actor pool + vertex programs.

This is the Ray-native analogue of the reference's per-iteration runtime
pipeline (``hvr_body``, reference src/hoover.cpp:3804-3947): each
iteration is scatter (send_vertex_updates, src/hoover.cpp:2548-2590) →
gather/apply (process_vertex_updates + update_vertices,
src/hoover.cpp:1895-2013, 2420-2487) → global convergence aggregate
(update_coupled_values, src/hoover.cpp:2819-3183). Differences by
design (SURVEY.md §1.2, §4):

- Vertex ownership is ``splitmix64(v) % P`` over stable 64-bit hashed
  ids — identity decoupled from placement (the reference pins vertices
  to the creating PE via the id encoding, inc/hvr_common.h:53-67).
- Synchronous BSP supersteps instead of the reference's asynchronous
  eventual consistency — a *stricter* ordering (its HVR_STRICT mode,
  src/hoover.cpp:3938-3944), so converged results match exactly.
- Messages are pre-aggregated per destination vertex *inside the source
  partition* (combiner via ``np.{add,minimum}.reduceat`` over edges
  pre-sorted by (dst_part, dst) at load time). A hub vertex with k
  in-edges receives at most P messages per superstep regardless of k —
  the explicit power-law skew handling the north rule demands.
- Exchange is one packed object per source partition per superstep
  (contiguous arrays + per-destination offsets, read zero-copy by every
  gather); no stage ever materializes the full edge set.
- Per-partition Parquet checkpoints + a manifest + metrics JSONL give
  mid-convergence resume (the analogue of dead-PE state pulls,
  src/hoover.cpp:774-802, done the lineage way).

Scale notes (multi-node): edge loading streams batch slices straight
into the partition actors (no separate shuffle materialization);
per-superstep traffic is P packed objects of combiner-reduced messages
(int32 dst-local indices + values). The two-level (tree) exchange was
MEASURED in round 4 (tools/exchange_tree_bench.py, BASELINE.md): on a
single node flat wins at every P up to 128 — reads are shared-memory
ref resolutions, so the P^2 term is nearly free while the tree adds a
store-and-forward copy of the whole message volume. Flat stays the
default at P ~ cores; on a real multi-node cluster the tree grouping
should follow NODE topology (aggregate once per node pair), where it
cuts cross-node object pulls from P^2 to G*P + P.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
from ray.data import Dataset

from . import segops
from .hashing import splitmix64


def part_of(v: "np.ndarray", P: int) -> "np.ndarray":
    """Partition owner of vertex ids: hash-mod (splitmix64 decorrelates
    biased id bit patterns — raw ``v % P`` collapses power-law RMAT/web
    ids onto low partitions)."""
    return (splitmix64(np.asarray(v, dtype=np.uint64)) % np.uint64(P)).astype(np.int64)


def _pair_key(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """16-byte big-endian (dst, src) keys: memcmp order == lexicographic
    numeric order, so one np.searchsorted merges / dedups edge runs that
    are sorted by (dst, src) without multi-key comparisons."""
    k = np.empty((len(dst), 2), dtype=">u8")
    k[:, 0] = dst
    k[:, 1] = src
    return k.reshape(-1).view("V16")


def _pairs_in(src, dst, dsrc, ddst) -> np.ndarray:
    """Exact membership mask: which (src[i], dst[i]) pairs appear in the
    (dsrc, ddst) set. Prefilter by src membership, then tag-and-lexsort
    the candidates against the deletion pairs (no hashing collisions,
    no Python loops)."""
    out = np.zeros(len(src), bool)
    cand = np.flatnonzero(np.isin(src, dsrc))
    if len(cand) == 0:
        return out
    cs, cd = src[cand], dst[cand]
    s_all = np.concatenate([dsrc, cs])
    d_all = np.concatenate([ddst, cd])
    tag = np.r_[np.zeros(len(dsrc), np.int8), np.ones(len(cs), np.int8)]
    order = np.lexsort((tag, d_all, s_all))
    s_o, d_o, t_o = s_all[order], d_all[order], tag[order]
    # a candidate row matches iff some earlier row in its (s, d) run is a
    # deletion row; deletion rows sort first within a run (tag 0 < 1)
    run_start = np.r_[True, (s_o[1:] != s_o[:-1]) | (d_o[1:] != d_o[:-1])]
    run_id = np.cumsum(run_start) - 1
    run_has_del = np.zeros(run_id[-1] + 1, bool)
    np.logical_or.at(run_has_del, run_id[t_o == 0], True)
    # map back: sorted positions of candidate rows -> original indices
    cand_pos = np.flatnonzero(t_o == 1)  # candidate rows, sorted order
    cand_orig = order[cand_pos] - len(dsrc)  # -> index into cand arrays
    hits = run_has_del[run_id[cand_pos]]
    out[cand[cand_orig[hits]]] = True
    return out


# --------------------------------------------------------------------------
# Vertex programs
# --------------------------------------------------------------------------


class VertexProgram:
    """Per-vertex program run by the engine (reference `update_metadata`
    callback surface, inc/hoover.h:51-52, vectorized over partitions).

    reduce: 'sum' | 'min' | 'labelvote' — how per-edge messages combine.
    """

    reduce: str = "sum"
    state_columns: tuple[str, ...] = ()
    # convergence: when conv_tol is not None, each superstep's exchange
    # carries the PREVIOUS superstep's global conv_stat sum; every actor
    # sees the same value and stops the burst at the same iteration —
    # exactly one deterministic superstep past the fixpoint, independent
    # of burst alignment (so interrupted+resumed runs match bit-for-bit).
    conv_tol: float | None = None
    burst_safe: bool = True
    # frontier=True (valid ONLY for monotone min programs, e.g. CC/BFS
    # where apply takes min(current, incoming)): apply() records the
    # locally-changed vertex indices in ctx.changed_idx and the next
    # scatter walks only those vertices' out-edges (CSR-by-src), making
    # late supersteps O(frontier edges) instead of O(E) — the analogue
    # of the reference's needs_processing dirty gating
    # (src/hoover.cpp:2420-2487).
    frontier: bool = False
    # edge_weight_fn: optional deterministic per-edge value derived from
    # the endpoint ids — ``fn(src_ids: uint64[], dst_ids: uint64[]) ->
    # ndarray`` — the engine analogue of the reference's per-edge info
    # (update_edge_info, src/hoover.cpp:485-520). Computed ONCE per
    # program init on the partition that stores the edge (never shipped:
    # weights live where the edges live), then combined into every
    # scattered message: mode 'add' -> message = value(src) + w (min-plus
    # semiring: weighted SSSP), mode 'mul' -> message = value(src) * w
    # (weighted random-surfer / masked propagation), mode 'gate_ge' ->
    # message = w where w >= value(src) else the int64 min-identity
    # sentinel (temporal gating: an edge stamped w is traversable only
    # at-or-after the source's current value — earliest-arrival
    # reachability over time-respecting paths; min-reduce programs),
    # mode 'cap_neg' -> message = max(value(src), -w): the NEGATED
    # max-min (bottleneck / widest-path) semiring — programs store
    # x = -bottleneck so the existing monotone min-reduce + frontier
    # machinery applies unchanged (algos/widest.py). Two masked modes
    # for edge-local symmetry breaking (min-reduce programs; the
    # identity is the dtype max): mode 'mask0' -> message = w where
    # value(src) == 0 else identity (an "active" source exposes its
    # incident edge keys), mode 'eq' -> message = w where w ==
    # value(src) else identity (a source endorses exactly the edge
    # whose key it shipped — the handshake half of maximal matching,
    # algos/matching.py). Programs may flip edge_weight_mode inside
    # vertex_values(): the scatter reads it after values are computed.
    edge_weight_fn: Any = None
    edge_weight_mode: str = "add"
    # ship_dtype (sum programs only): cast scatter values to this dtype
    # before the edge gather + combiner, halving the hot random-gather
    # footprint and the shipped message bytes (float32 keeps the
    # per-partition value array L2-resident at web-graph scale). The
    # gather side still ACCUMULATES in float64, so only the per-(part,
    # dst) combined partials are quantized (~6e-8 relative each).
    ship_dtype: Any = None

    def conv_stat(self, stats: Any) -> float:
        """Local convergence contribution (summed across partitions)."""
        return float("inf")

    def init_state(self, ctx) -> dict[str, np.ndarray]:
        raise NotImplementedError

    def init_stats(self, ctx) -> Any:
        return None

    def vertex_values(self, ctx) -> np.ndarray:
        """Per-LOCAL-VERTEX scatter values, (n_local,) or (n_local, d).
        The engine gathers them onto edges per destination partition
        (fused gather + combiner — the per-edge value slice stays in
        cache between the gather and its reduceat)."""
        raise NotImplementedError

    def send_messages(self, ctx):
        """Optional arbitrary vertex-to-vertex messages (reference
        ``hvr_send_msg``/``hvr_poll_msg``, src/hoover.cpp:1843-1893):
        return (dst_vertex_ids: uint64 array, payload: (n,) or (n, d)
        array), or None. Routed by ``part_of(dst)`` piggybacked on the
        packed exchange; delivered unordered as ``ctx.inbox =
        (local_idx, payload)`` on the owning partition before the next
        superstep's apply(). Messages to unknown vertex ids are dropped
        (the reference asserts; dropping keeps deletion races benign)."""
        return None

    def scatter_extras(self, ctx) -> dict:
        """Numeric partials summed across partitions and merged into the
        globals seen by apply() in the SAME superstep (e.g. dangling rank
        mass) — the coupled-metric channel (reference inc/hoover.h:61-68)
        piggybacked on the message exchange."""
        return {}

    def apply(self, ctx, idx: np.ndarray, vals: np.ndarray, g: dict) -> Any:
        """Update ctx.state given aggregated messages; return local stats."""
        raise NotImplementedError

    def driver_init(self, stats: list[Any]) -> dict:
        return {}

    def driver_step(self, stats: list[Any], g: dict, it: int) -> tuple[dict, bool, dict]:
        """-> (globals for next iter, converged, metrics row)."""
        return g, False, {}


@dataclass
class PartCtx:
    """What a program sees inside one partition actor."""

    part_id: int
    num_parts: int
    verts: np.ndarray  # sorted owned vertex ids (uint64)
    out_deg: np.ndarray  # per owned vertex (int64)
    n_total: int  # global vertex count
    edge_src_idx: np.ndarray  # per stored edge: local index of src (int32)
    inv_outdeg: np.ndarray | None = None  # per owned vertex, 0 for danglers
    w_out_sum: np.ndarray | None = None  # per owned vertex sum of out-edge weights
    changed_idx: np.ndarray | None = None  # set by frontier programs' apply()
    inbox: tuple | None = None  # (local_idx, payload) vertex->vertex messages
    state: dict[str, np.ndarray] = field(default_factory=dict)

    @property
    def n_local(self) -> int:
        return len(self.verts)


# --------------------------------------------------------------------------
# Partition actor
# --------------------------------------------------------------------------


@ray.remote
class GraphPartition:
    """Owns one hash-partition: CSR-ish edge arrays + vertex state.

    Analogue of one PE's vertex pool + edge matrix (reference
    inc/hvr_vertex_cache.h, inc/hvr_irregular_matrix.h) as numpy arrays.
    """

    def __init__(self, part_id: int, num_parts: int, dedup: bool = True):
        self.pid = part_id
        self.P = num_parts
        self.dedup = dedup
        self._edge_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self._vert_chunks: list[np.ndarray] = []
        self._del_chunks: list[tuple[np.ndarray, np.ndarray]] = []
        self._vdel_chunks: list[np.ndarray] = []
        self.prog: VertexProgram | None = None

    # ---- load phase -------------------------------------------------
    def add_edges(self, src: np.ndarray, dst: np.ndarray) -> None:
        self._edge_chunks.append((src, dst))

    def add_vertices(self, ids: np.ndarray) -> None:
        self._vert_chunks.append(ids)

    def add_chunk(self, src, dst, vert_ids) -> None:
        """One combined load call per (router task, actor): edge slice
        owned by this partition plus raw dst ids owned by it (dedup
        deferred to finalize)."""
        if src is not None:
            self._edge_chunks.append((src, dst))
        if vert_ids is not None:
            self._vert_chunks.append(vert_ids)

    def add_del_chunk(self, src, dst) -> None:
        """Buffer edge deletions (applied at the next finalize) — the
        analogue of the reference's buffered change queue
        (inc/hvr_buffered_changes.h, drained by process_buffered_changes
        src/hoover.cpp:2384-2418)."""
        if src is not None:
            self._del_chunks.append((src, dst))

    def add_vertex_deletions(self, ids: np.ndarray) -> None:
        """Buffer vertex deletions. Every actor receives the full set:
        edges pointing AT a deleted vertex live on the src-owner, so
        deletion is a broadcast invalidation (the reference's
        handle_deleted_vertex mirror invalidation,
        src/hoover.cpp:1695-1733)."""
        self._vdel_chunks.append(np.asarray(ids, dtype=np.uint64))

    def finalize(self, keep_raw: bool = False) -> tuple[int, int]:
        """Phase 1 of the (re)build: assemble the raw edge set (inserts,
        deletions), dedup, sort by (dst_part, dst), build the
        per-destination segment structure. Vertex-index-dependent arrays
        are built in phase 2 (``build_incoming_index``) once the seg
        exchange has told every owner which of its vertices are message
        targets — so the router never ships dst ids to their owners.
        Returns (0, n_local_edges); vertex counts come from phase 2.

        keep_raw retains the finalized arrays as the merge base so
        further ``add_chunk`` calls + a re-finalize can extend the graph
        incrementally (streaming inserts, reference
        test/update_rates.cpp:31-56 / connected_components.c:62-86).

        Incremental path: the edge arrays are kept sorted by
        (dst_part, dst, src), so a streamed batch is lexsorted ALONE
        (O(batch log batch)) and merged into the prior run with one
        searchsorted per partition over cached 16-byte (dst, src) keys —
        no re-sort, no re-hash, no re-dedup of the stored edge set (the
        reference's delta-only update_edge_info, src/hoover.cpp:450-600).
        Deletions are order-preserving masks on the sorted run."""
        P = self.P
        t_fin = time.perf_counter()
        if getattr(self, "ctx", None) is not None:
            # snapshot state for warm restart after a graph extension
            self._warm = (self.ctx.verts, dict(self.ctx.state))
        self._prior_verts = (
            self.verts
            if getattr(self, "verts", None) is not None
            else np.empty(0, np.uint64)
        )
        has_prior = getattr(self, "_prior_kept", False)
        if not has_prior:
            self.edge_dst = np.empty(0, np.uint64)
            self._edge_src_sorted = np.empty(0, np.uint64)
            self._edge_key = None
            self.part_starts = np.zeros(P + 1, np.int64)
        elif getattr(self, "_edge_key", None) is None:
            self._edge_key = _pair_key(self.edge_dst, self._edge_src_sorted)
        # ---- buffered deletions apply to the PRIOR graph only: a pair
        # both deleted and re-inserted in the same batch survives (the
        # delete-old-edge-set / insert-new-edge-set replacement pattern).
        # (reference src/hvr_vertex.cpp:25-48, src/hoover.cpp:1695-1733;
        # behavior spec test/remove_vertices_test.c)
        had_dels = bool(self._vdel_chunks or self._del_chunks)
        if had_dels:
            keep = np.ones(len(self.edge_dst), bool)
            if self._vdel_chunks:
                vdels = np.unique(np.concatenate(self._vdel_chunks))
                self._vdel_chunks = []
                if len(self._prior_verts):
                    self._prior_verts = self._prior_verts[
                        ~np.isin(self._prior_verts, vdels)
                    ]
                if len(keep):
                    keep &= ~(
                        np.isin(self._edge_src_sorted, vdels)
                        | np.isin(self.edge_dst, vdels)
                    )
            if self._del_chunks and len(keep):
                dsrc = np.concatenate([c[0] for c in self._del_chunks])
                ddst = np.concatenate([c[1] for c in self._del_chunks])
                keep &= ~_pairs_in(self._edge_src_sorted, self.edge_dst, dsrc, ddst)
            self._del_chunks = []
            if not keep.all():
                # order-preserving compaction of the sorted run
                per_part = np.array(
                    [
                        int(keep[self.part_starts[q] : self.part_starts[q + 1]].sum())
                        for q in range(P)
                    ],
                    np.int64,
                )
                self.edge_dst = self.edge_dst[keep]
                self._edge_src_sorted = self._edge_src_sorted[keep]
                if self._edge_key is not None:
                    self._edge_key = self._edge_key[keep]
                self.part_starts = np.r_[np.int64(0), np.cumsum(per_part)]
        # ---- incoming batch: sort + dedup the DELTA only --------------
        if self._edge_chunks:
            bsrc = np.concatenate([c[0] for c in self._edge_chunks])
            bdst = np.concatenate([c[1] for c in self._edge_chunks])
        else:
            bsrc = np.empty(0, np.uint64)
            bdst = np.empty(0, np.uint64)
        self._edge_chunks = []
        bpart = part_of(bdst, P)
        order = np.lexsort((bsrc, bdst, bpart))
        bsrc, bdst, bpart = bsrc[order], bdst[order], bpart[order]
        if self.dedup and len(bsrc):
            # all edges with this src live here, so local dedup == global
            # dedup (keeps simple-graph semantics after symmetrize,
            # matching the reference's idempotent edge upsert,
            # src/hoover.cpp:485)
            keepb = np.r_[True, (bsrc[1:] != bsrc[:-1]) | (bdst[1:] != bdst[:-1])]
            bsrc, bdst, bpart = bsrc[keepb], bdst[keepb], bpart[keepb]
        n_batch = len(bsrc)
        old_seg_ridx = getattr(self, "seg_ridx", None)
        if len(self.edge_dst):
            self._merge_batch(bsrc, bdst, bpart)
            mode = "incremental"
            # phase 2 can remap instead of rebuild iff the prior index
            # exists and no deletion invalidated positions this round
            self._inc_index_ok = (
                not had_dels and getattr(self, "src_order", None) is not None
            )
        else:
            self.edge_dst = bdst
            self._edge_src_sorted = bsrc
            self.part_starts = np.searchsorted(bpart, np.arange(P + 1)).astype(
                np.int64
            )
            self._edge_key = _pair_key(bdst, bsrc) if keep_raw else None
            mode = "full"
            self._inc_index_ok = False
        # per destination partition: unique dst ids + reduceat segment starts
        self.seg_udst: list[np.ndarray] = []
        self.seg_starts: list[np.ndarray] = []
        for q in range(P):
            a, b = self.part_starts[q], self.part_starts[q + 1]
            d = self.edge_dst[a:b]
            if len(d) == 0:
                self.seg_udst.append(np.empty(0, np.uint64))
                self.seg_starts.append(np.empty(0, np.int64))
                continue
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            self.seg_udst.append(d[starts])
            self.seg_starts.append(starts)
        self.n_edges = len(self.edge_dst)
        # per-edge destination partition (frontier scatter path)
        self.edge_q = np.repeat(
            np.arange(P, dtype=np.int16), np.diff(self.part_starts)
        )
        # delta exchange eligibility: the prior outgoing index survives a
        # pure-insert incremental merge (deletions re-shape segments;
        # vertex deletions broadcast, so every actor full-rebuilds then)
        if mode == "incremental" and not had_dels and old_seg_ridx is not None:
            self._seg_delta = [
                (ids, np.searchsorted(self.seg_udst[q], ids))
                for q, ids in enumerate(self._seg_new_scratch)
            ]
            self._old_seg_ridx = old_seg_ridx
        else:
            self._seg_delta = None
            self._old_seg_ridx = None
        self.seg_ridx: list[np.ndarray] | None = None  # filled by index exchange
        self._walk_dst = None  # walk CSR cache is graph-shape-dependent
        self._prior_kept = keep_raw
        if not keep_raw:
            self._edge_key = None
        self._rebuild_info = {
            "mode": mode,
            "batch_rows": int(n_batch),
            "sec": round(time.perf_counter() - t_fin, 4),
        }
        return 0, self.n_edges

    def _merge_batch(self, bsrc, bdst, bpart) -> None:
        """Merge a (dst_part, dst, src)-sorted deduped batch into the
        prior sorted edge run: per touched partition, ONE searchsorted of
        the batch keys into the cached prior keys positions both sides
        (O(prior_seg) scatter-copy + O(batch log prior) search — no sort
        of the stored edges). Batch pairs already present are dropped.

        Records the merge permutation (new global position of every old
        edge, and of every kept batch edge + its src) so phase 2 can
        REMAP the vertex-dependent structures instead of rebuilding
        them (``_build_index_incremental``)."""
        P = self.P
        bstarts = np.searchsorted(bpart, np.arange(P + 1))
        out_src, out_dst, out_key, sizes = [], [], [], []
        perm_old = np.empty(len(self.edge_dst), np.int64)
        kept_pos, kept_src = [], []
        self._seg_new_scratch = [np.empty(0, np.uint64) for _ in range(P)]
        new_off = 0
        for q in range(P):
            a, b = int(self.part_starts[q]), int(self.part_starts[q + 1])
            c, d = int(bstarts[q]), int(bstarts[q + 1])
            if c == d:  # untouched partition: reuse the prior run as-is
                out_src.append(self._edge_src_sorted[a:b])
                out_dst.append(self.edge_dst[a:b])
                out_key.append(self._edge_key[a:b])
                sizes.append(b - a)
                perm_old[a:b] = np.arange(new_off, new_off + (b - a))
                new_off += b - a
                continue
            kp = self._edge_key[a:b]
            bs, bd = bsrc[c:d], bdst[c:d]
            kb = _pair_key(bd, bs)
            idx = np.searchsorted(kp, kb, side="left")
            if self.dedup and b > a:
                m = idx < (b - a)
                dup = np.zeros(d - c, bool)
                dup[m] = kp[idx[m]] == kb[m]
                if dup.any():
                    fresh = ~dup
                    bs, bd, kb, idx = bs[fresh], bd[fresh], kb[fresh], idx[fresh]
            n, mrows = b - a, len(bs)
            src_o = np.empty(n + mrows, np.uint64)
            dst_o = np.empty(n + mrows, np.uint64)
            key_o = np.empty(n + mrows, kp.dtype)
            pos_b = idx + np.arange(mrows)
            cnt = np.bincount(idx, minlength=n + 1)
            pos_p = np.arange(n) + np.cumsum(cnt)[:n]
            src_o[pos_p] = self._edge_src_sorted[a:b]
            src_o[pos_b] = bs
            dst_o[pos_p] = self.edge_dst[a:b]
            dst_o[pos_b] = bd
            key_o[pos_p] = kp
            key_o[pos_b] = kb
            out_src.append(src_o)
            out_dst.append(dst_o)
            out_key.append(key_o)
            sizes.append(n + mrows)
            perm_old[a:b] = pos_p + new_off
            kept_pos.append(pos_b + new_off)
            kept_src.append(bs)
            new_off += n + mrows
            # dst ids this batch references in q for the FIRST time (the
            # seg-exchange delta): kept batch dsts absent from the prior
            # segment's (dst-sorted) run — self.edge_dst is still the
            # pre-merge array here (reassigned after the loop)
            if mrows:
                ub = np.unique(bd)
                old_d = self.edge_dst[a:b]
                p2 = np.searchsorted(old_d, ub)
                fresh_d = np.ones(len(ub), bool)
                mm = p2 < len(old_d)
                fresh_d[mm] = old_d[p2[mm]] != ub[mm]
                self._seg_new_scratch[q] = ub[fresh_d]
        self._edge_src_sorted = np.concatenate(out_src)
        self.edge_dst = np.concatenate(out_dst)
        self._edge_key = np.concatenate(out_key)
        self.part_starts = np.r_[np.int64(0), np.cumsum(np.array(sizes, np.int64))]
        self._merge_perm_old = perm_old
        self._merge_batch_pos = (
            np.concatenate(kept_pos) if kept_pos else np.empty(0, np.int64)
        )
        self._merge_batch_src = (
            np.concatenate(kept_src) if kept_src else np.empty(0, np.uint64)
        )

    # ---- one-time destination-index exchange + phase-2 build ----------
    def finalize_segs(self, keep_raw: bool = False) -> tuple:
        """Phase 1 + seg export in ONE actor round trip: called with
        ``num_returns=P+2`` so each per-destination dst-id list becomes
        its own return object — the exchange is point-to-point (each
        receiver fetches only its column of the P x P matrix, never the
        O(P^2) broadcast of every actor's full list — the documented
        large-P limit) with zero explicit ray.put round trips."""
        meta = self.finalize(keep_raw)
        if self._seg_delta is not None:
            # delta exchange: ship only the dst ids each owner has never
            # been asked about — O(new referenced ids), not O(E)
            cells = [("delta", ids) for ids, _ in self._seg_delta]
        else:
            cells = [("full", s) for s in self.seg_udst]
        return (meta, self._rebuild_info, *cells)

    def build_incoming_index(self, *cells) -> tuple:
        """Phase 2. ``cells[p] = (kind, ids)`` holds dst ids partition p
        will message here (kind "full": p's complete per-destination
        list; kind "delta": only ids p never asked about before — the
        delta exchange). Union them with local srcs and prior vertices
        to form the vertex index, then build every vertex-dependent
        structure (src_idx, out_deg, CSR-by-src, inv outdeg). Called
        with ``num_returns=P+2``: returns n_local, the vertex ids ADDED
        to this index this rebuild (senders shift their stored local
        indices by it), then for each source partition p the local
        int32 indices of exactly the ids p sent (per-superstep messages
        then carry compact local indices instead of 64-bit ids).

        After an incremental finalize (no deletions), the
        vertex-dependent structures are REMAPPED through the merge
        permutation instead of rebuilt: the O(E log E) unique + argsort
        drop to O(new vertices + batch log E) plus O(E) gathers — the
        delta-only index maintenance half of update_edge_info
        (reference src/hoover.cpp:450-600). Prior vertices are always
        retained, so the index only shrinks via vertex deletions, which
        broadcast (every actor full-rebuilds) — the invariant the
        senders' delta remap relies on."""
        incoming = [c[1] for c in cells]
        if getattr(self, "_inc_index_ok", False):
            self._inc_index_ok = False
            return self._build_index_incremental(incoming)
        verts_prev = self._prior_verts
        chunks = list(self._vert_chunks) + incoming
        self._vert_chunks = []
        if len(self._prior_verts):
            chunks.append(self._prior_verts)
        if len(self._edge_src_sorted):
            chunks.append(self._edge_src_sorted)
        self.verts = (
            np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.uint64)
        )
        n = len(self.verts)
        # ids newly added vs the pre-rebuild index (sorted setdiff)
        if len(verts_prev):
            pos = np.searchsorted(verts_prev, self.verts)
            miss = np.ones(n, bool)
            m = pos < len(verts_prev)
            miss[m] = verts_prev[pos[m]] != self.verts[m]
            added = self.verts[miss]
        else:
            added = self.verts
        self.edge_src_idx = np.searchsorted(self.verts, self._edge_src_sorted).astype(
            np.int32
        )
        out_deg = (
            np.bincount(self.edge_src_idx, minlength=n).astype(np.int64)
            if n
            else np.zeros(0, np.int64)
        )
        self.out_deg = out_deg
        with np.errstate(divide="ignore"):
            inv = 1.0 / out_deg.astype(np.float64)
        inv[out_deg == 0] = 0.0
        self.inv_outdeg = inv
        self.src_order = np.argsort(self.edge_src_idx, kind="stable").astype(np.int32)
        self.src_indptr = np.r_[np.int64(0), np.cumsum(out_deg)]
        return (
            n,
            added,
            *(np.searchsorted(self.verts, inc).astype(np.int32) for inc in incoming),
        )

    def _build_index_incremental(self, incoming: list) -> tuple:
        """Phase 2 after an incremental merge: compute the (typically
        tiny) set of newly-referenced vertex ids, splice them into the
        sorted vertex index, then scatter-remap edge_src_idx / out_deg /
        CSR order through the merge permutation. Produces bit-identical
        structures to the full rebuild (pinned by the structural-equality
        streaming tests)."""
        verts_old = self.verts
        cand = list(self._vert_chunks)
        self._vert_chunks = []
        cand.extend(incoming)
        cand.append(self._merge_batch_src)
        cand = np.concatenate(cand) if cand else np.empty(0, np.uint64)
        if len(cand) and len(verts_old):
            pos = np.searchsorted(verts_old, cand)
            miss = np.ones(len(cand), bool)
            m = pos < len(verts_old)
            miss[m] = verts_old[pos[m]] != cand[m]
            added = np.unique(cand[miss])
        else:
            added = np.unique(cand)
        V, A = len(verts_old), len(added)
        if A:
            ins = np.searchsorted(verts_old, added)
            verts_new = np.empty(V + A, np.uint64)
            pos_a = ins + np.arange(A)
            cnt = np.bincount(ins, minlength=V + 1)
            pos_v = np.arange(V) + np.cumsum(cnt)[:V]  # new index of old vert j
            verts_new[pos_v] = verts_old
            verts_new[pos_a] = added
        else:
            verts_new = verts_old
            pos_v = None
        self.verts = verts_new
        n = len(verts_new)
        perm = self._merge_perm_old
        bpos = self._merge_batch_pos
        # edge_src_idx: remap old values (monotone shift) + batch fill
        esi = np.empty(len(self.edge_dst), np.int32)
        old_vals = (
            self.edge_src_idx
            if pos_v is None
            else pos_v[self.edge_src_idx].astype(np.int32)
        )
        esi[perm] = old_vals
        b_esi = np.searchsorted(verts_new, self._merge_batch_src).astype(np.int32)
        esi[bpos] = b_esi
        # out_deg: scatter old counts to shifted slots + batch increments
        out_deg = np.zeros(n, np.int64)
        if pos_v is None:
            out_deg[: len(self.out_deg)] = self.out_deg
        else:
            out_deg[pos_v] = self.out_deg
        if len(b_esi):
            np.add.at(out_deg, b_esi, 1)
        with np.errstate(divide="ignore"):
            inv = 1.0 / out_deg.astype(np.float64)
        inv[out_deg == 0] = 0.0
        # CSR order: merge the (still-sorted) remapped old order with the
        # batch edges on composite (src_idx, position) keys — identical
        # to the full stable argsort
        old_csr = perm[self.src_order]
        keys_old = (esi[old_csr].astype(np.uint64) << np.uint64(32)) | old_csr.astype(
            np.uint64
        )
        bo = np.lexsort((bpos, b_esi))
        b_csr = bpos[bo]
        keys_b = (b_esi[bo].astype(np.uint64) << np.uint64(32)) | b_csr.astype(
            np.uint64
        )
        nO, nB = len(keys_old), len(keys_b)
        so = np.empty(nO + nB, np.int32)
        idx = np.searchsorted(keys_old, keys_b, side="left")
        so[idx + np.arange(nB)] = b_csr.astype(np.int32)
        cnt = np.bincount(idx, minlength=nO + 1)
        so[np.arange(nO) + np.cumsum(cnt)[:nO]] = old_csr.astype(np.int32)
        self.edge_src_idx = esi
        self.out_deg = out_deg
        self.inv_outdeg = inv
        self.src_order = so
        self.src_indptr = np.r_[np.int64(0), np.cumsum(out_deg)]
        self._merge_perm_old = self._merge_batch_pos = self._merge_batch_src = None
        return (
            n,
            added,
            *(np.searchsorted(self.verts, inc).astype(np.int32) for inc in incoming),
        )

    def n_local(self) -> int:
        v = getattr(self, "verts", None)
        return 0 if v is None else len(v)

    def edge_arrays(self) -> tuple:
        """Debug/test accessor: the finalized sorted edge run + partition
        boundaries (structural-equality checks between incremental merges
        and cold rebuilds)."""
        return self._edge_src_sorted, self.edge_dst, self.part_starts

    def index_arrays(self) -> tuple:
        """Debug/test accessor: every vertex-dependent structure phase 2
        builds (equality checks incremental remap vs full rebuild)."""
        return (
            self.verts,
            self.edge_src_idx,
            self.out_deg,
            self.src_order,
            self.src_indptr,
        )

    def exchange_arrays(self) -> tuple:
        """Debug/test accessor: outgoing index state (delta-exchange
        equality checks vs a cold full exchange)."""
        return list(self.seg_ridx), self.edge_ridx

    def push_transpose(self, actors: list) -> None:
        """Ship this partition's edges REVERSED to their transpose
        owners: the finalized per-destination segments are already
        grouped by owner(dst) == owner(reversed src), so building the
        transpose graph is one actor-to-actor slice push per (p, q)
        cell — no Dataset re-route, no re-hash, no swap pass."""
        futs = []
        for q in range(self.P):
            a, b = int(self.part_starts[q]), int(self.part_starts[q + 1])
            if a < b:
                futs.append(
                    actors[q].add_chunk.remote(
                        self.edge_dst[a:b], self._edge_src_sorted[a:b], None
                    )
                )
        ray.get(futs)

    def set_outgoing_idx(self, *args) -> None:
        """args = P answer arrays (owner-local indices of exactly the
        ids this partition SENT to each owner — full lists or deltas)
        followed by P ``added`` arrays (the vertex ids each owner
        spliced into its index this rebuild). After a delta exchange,
        stored indices for previously-registered ids are shifted by the
        owner's insertions (new_idx = old_idx + #added before the id) —
        no O(E) re-answer. Ends with the per-edge expansion for the
        labelvote path (per-iteration (dst,label) segments)."""
        P = self.P
        answers = list(args[:P])
        added = list(args[P:])
        if getattr(self, "_seg_delta", None) is None:
            self.seg_ridx = answers
        else:
            ridx = []
            for q in range(P):
                new_ids, new_pos = self._seg_delta[q]
                old = self._old_seg_ridx[q]
                segn = len(self.seg_udst[q])
                out = np.empty(segn, np.int32)
                mask = np.ones(segn, bool)
                mask[new_pos] = False
                if len(added[q]):
                    out[mask] = old + np.searchsorted(
                        added[q], self.seg_udst[q][mask]
                    ).astype(np.int32)
                else:
                    out[mask] = old
                out[new_pos] = answers[q]
                ridx.append(out)
            self.seg_ridx = ridx
            self._seg_delta = self._old_seg_ridx = None
        edge_ridx = np.empty(self.n_edges, np.int32)
        for q in range(self.P):
            a, b = self.part_starts[q], self.part_starts[q + 1]
            if a < b:
                lengths = np.diff(np.r_[self.seg_starts[q], b - a])
                edge_ridx[a:b] = np.repeat(self.seg_ridx[q], lengths)
        self.edge_ridx = edge_ridx

    # ---- program lifecycle ------------------------------------------
    def init_program(self, prog: VertexProgram, n_total: int, warm: bool = False) -> Any:
        self.prog = prog
        self.ctx = PartCtx(
            part_id=self.pid,
            num_parts=self.P,
            verts=self.verts,
            out_deg=self.out_deg,
            n_total=n_total,
            edge_src_idx=self.edge_src_idx,
            inv_outdeg=self.inv_outdeg,
        )
        ewf = getattr(prog, "edge_weight_fn", None)
        self._edge_w = (
            np.asarray(ewf(self._edge_src_sorted, self.edge_dst))
            if ewf is not None and self.n_edges
            else None
        )
        if ewf is not None:
            # per-vertex out-weight totals (all out-edges of an owned
            # vertex are stored locally, so this is the global sum) —
            # programs normalize shipped values by it (weighted PageRank)
            self.ctx.w_out_sum = (
                np.bincount(
                    self.edge_src_idx,
                    weights=self._edge_w.astype(np.float64),
                    minlength=len(self.verts),
                )
                if self._edge_w is not None
                else np.zeros(len(self.verts), np.float64)
            )
        self.ctx.state = self.prog.init_state(self.ctx)
        if warm and getattr(self, "_warm", None) is not None:
            # carry prior per-vertex state into the extended graph (new
            # vertices keep their fresh init values; vertices deleted
            # since the snapshot are skipped) — incremental convergence
            # picks up where the last stream batch left off
            old_v, old_s = self._warm
            pos = np.clip(np.searchsorted(self.verts, old_v), 0, max(len(self.verts) - 1, 0))
            alive = (self.verts[pos] == old_v) if len(self.verts) else np.zeros(len(old_v), bool)
            for c, arr in old_s.items():
                if c in self.ctx.state:
                    self.ctx.state[c][pos[alive]] = arr[alive]
        self._last_conv = float("inf")
        self._global_prev_conv = float("inf")
        self._last_packed = None
        self._applied_iters = 0
        self._scatter_count = 0
        return self.prog.init_stats(self.ctx)

    def scatter_packed(self, g: dict):
        """Compute per-vertex scatter values, gather them onto edges and
        combiner-aggregate per (dst_part, dst); return ONE packed object.

        One object per source partition per superstep: on a node every
        gather reads it zero-copy from the shared object store; across
        nodes it ships once per node. (The split alternative — P^2 tiny
        objects via num_returns=P — is latency-bound at web-graph message
        sizes.) ``extras`` carries program globals partials (e.g. dangling
        rank mass) so globals need no extra driver round-trip.

        The gather is fused PER DESTINATION PARTITION: each ~E/P^2-edge
        value slice is produced and reduced while still in cache, instead
        of materializing one E-sized per-edge array to DRAM and re-reading
        it. For frontier programs, when the changed-vertex set is small
        the scatter walks only the frontier's out-edges (CSR-by-src) —
        O(frontier) instead of O(E)."""
        P, prog = self.P, self.prog
        vv = prog.vertex_values(self.ctx)
        if prog.ship_dtype is not None and vv.dtype != prog.ship_dtype:
            vv = vv.astype(prog.ship_dtype)
        if prog.reduce in ("sum", "min"):
            red = np.add if prog.reduce == "sum" else np.minimum
            ci = self.ctx.changed_idx
            use_sparse = (
                prog.frontier
                and self._scatter_count > 0
                and ci is not None
                and self.n_edges > 0
            )
            if use_sparse:
                cnt = self.src_indptr[ci + 1] - self.src_indptr[ci]
                total = int(cnt.sum())
                # sparse costs ~2 sorts of the active edges; only worth
                # it when the frontier covers a minority of edges
                if 4 * total > self.n_edges:
                    use_sparse = False
            if use_sparse:
                out = self._scatter_sparse(vv, ci, cnt, total, red)
            else:
                out = self._scatter_dense(vv, red)
        elif prog.reduce == "labelvote":
            us, vs, cs, off = [], [], [], np.zeros(P + 1, np.int64)
            for q in range(P):
                a, b = self.part_starts[q], self.part_starts[q + 1]
                if a < b:
                    ridx = self.edge_ridx[a:b]
                    lab = vv[self.edge_src_idx[a:b]]
                    order = np.lexsort((lab, ridx))
                    ds_, ls_ = ridx[order], lab[order]
                    new = np.r_[True, (ds_[1:] != ds_[:-1]) | (ls_[1:] != ls_[:-1])]
                    starts = np.flatnonzero(new)
                    cnt = np.diff(np.r_[starts, len(ds_)])
                    us.append(ds_[starts])
                    vs.append(ls_[starts])
                    cs.append(cnt.astype(np.int64))
                    off[q + 1] = off[q] + len(starts)
                else:
                    off[q + 1] = off[q]
            out = {
                "i": np.concatenate(us) if us else np.empty(0, np.int32),
                "v": np.concatenate(vs) if vs else np.empty(0, np.uint64),
                "c": np.concatenate(cs) if cs else np.empty(0, np.int64),
                "off": off,
            }
        else:  # pragma: no cover
            raise ValueError(self.prog.reduce)
        msgs = prog.send_messages(self.ctx)
        if msgs is not None:
            mids, mvals = msgs
            mids = np.asarray(mids, dtype=np.uint64)
            mpart = part_of(mids, P)
            morder = np.argsort(mpart, kind="stable")
            out["m_ids"] = mids[morder]
            out["m_vals"] = np.asarray(mvals)[morder]
            out["m_off"] = np.searchsorted(mpart[morder], np.arange(P + 1))
        extras = prog.scatter_extras(self.ctx)
        if prog.conv_tol is not None:
            extras["__conv"] = self._last_conv
        out["extras"] = extras
        self._last_packed = out
        self._scatter_count += 1
        return out

    def _apply_edge_w(self, vals, w):
        """Combine per-edge weights into gathered per-edge values."""
        if vals.ndim == 2 and w.ndim == 1:
            w = w[:, None]
        mode = self.prog.edge_weight_mode
        if mode == "add":
            return vals + w
        if mode == "gate_ge":
            # temporal gate: traversable only at-or-after value(src);
            # ineligible edges ship the min-identity sentinel
            return np.where(w >= vals, w, np.iinfo(np.int64).max // 2)
        if mode == "cap_neg":
            # negated bottleneck: min(bneck(src), w) == -max(-bneck, -w)
            return np.maximum(vals, -w)
        if mode in ("mask0", "eq"):
            ident = (
                np.array(np.inf, w.dtype)
                if w.dtype.kind == "f"
                else np.array(np.iinfo(w.dtype).max, w.dtype)
            )
            keep = (vals == 0) if mode == "mask0" else (w == vals)
            return np.where(keep, w, ident)
        return vals * w

    def _scatter_dense(self, vv: np.ndarray, red) -> dict:
        P = self.P
        us, vs, off = [], [], np.zeros(P + 1, np.int64)
        for q in range(P):
            a, b = self.part_starts[q], self.part_starts[q + 1]
            if a < b:
                vals_q = vv[self.edge_src_idx[a:b]]
                if self._edge_w is not None:
                    vals_q = self._apply_edge_w(vals_q, self._edge_w[a:b])
                us.append(self.seg_ridx[q])  # dst-local int32 indices
                vs.append(red.reduceat(vals_q, self.seg_starts[q], axis=0))
            off[q + 1] = off[q] + (len(us[-1]) if a < b else 0)
        return {
            "i": np.concatenate(us) if us else np.empty(0, np.int32),
            "v": np.concatenate(vs) if vs else np.empty(0, np.float64),
            "c": None,
            "off": off,
        }

    def _scatter_sparse(self, vv, ci, cnt, total, red) -> dict:
        """Frontier scatter: walk only the changed vertices' out-edges."""
        P = self.P
        off = np.zeros(P + 1, np.int64)
        if total == 0:
            return {
                "i": np.empty(0, np.int32),
                "v": np.empty(0, vv.dtype),
                "c": None,
                "off": off,
            }
        starts = self.src_indptr[ci]
        # expand [starts[j], starts[j]+cnt[j]) ranges without Python loops
        offs = np.repeat(starts - np.r_[np.int64(0), np.cumsum(cnt)[:-1]], cnt)
        pos = self.src_order[offs + np.arange(total, dtype=np.int64)]
        q = self.edge_q[pos]
        r = self.edge_ridx[pos]
        vals = np.repeat(vv[ci], cnt, axis=0)
        if self._edge_w is not None:
            vals = self._apply_edge_w(vals, self._edge_w[pos])
        order = np.lexsort((r, q))
        q, r, vals = q[order], r[order], vals[order]
        new = np.r_[True, (q[1:] != q[:-1]) | (r[1:] != r[:-1])]
        sstarts = np.flatnonzero(new)
        uq = q[sstarts]
        out = {
            "i": r[sstarts],
            "v": red.reduceat(vals, sstarts, axis=0),
            "c": None,
            "off": np.searchsorted(uq, np.arange(P + 1)).astype(np.int64),
        }
        return out

    def _member_views(self, packed) -> list:
        """Flatten incoming blocks — raw per-partition packed dicts OR
        two-level relay bundles (see ``combine_group``) — into per-source-
        partition member views in GLOBAL source-partition order. Each
        view is (extras, i, v, c, m_ids, m_vals), pre-sliced (zero-copy)
        for this destination partition. Keeping member granularity (not
        merging members inside a bundle) preserves two invariants the
        gather relies on: per-slice indices stay UNIQUE (the dense
        accumulate would silently drop duplicate fancy indices) and the
        float accumulation order matches the flat exchange bit-for-bit
        (bundles arrive in ascending source-group order and members are
        stored in ascending partition order within a bundle)."""
        pid = self.pid
        views = []
        for pk in packed:
            if pk.get("bundle"):
                ql = pid - pk["dst_base"]
                off = pk["off"]
                for m in range(off.shape[0]):
                    a, b = off[m, ql], off[m, ql + 1]
                    i = pk["i"][a:b]
                    v = pk["v"][a:b]
                    c = None if pk["c"] is None else pk["c"][a:b]
                    if "m_off" in pk:
                        ma, mb = pk["m_off"][m, ql], pk["m_off"][m, ql + 1]
                        mi, mv = pk["m_ids"][ma:mb], pk["m_vals"][ma:mb]
                    else:
                        mi = mv = None
                    views.append((pk["extras_list"][m], i, v, c, mi, mv))
            else:
                a, b = pk["off"][pid], pk["off"][pid + 1]
                i = pk["i"][a:b]
                v = pk["v"][a:b]
                c = None if pk["c"] is None else pk["c"][a:b]
                if "m_ids" in pk:
                    ma, mb = pk["m_off"][pid], pk["m_off"][pid + 1]
                    mi, mv = pk["m_ids"][ma:mb], pk["m_vals"][ma:mb]
                else:
                    mi = mv = None
                views.append((pk["extras"], i, v, c, mi, mv))
        return views

    def _gather_apply(self, g: dict, packed) -> Any:
        """Combine incoming packed message blocks, apply program.

        Each packed block holds contiguous (u, v[, c]) arrays with
        per-destination-partition offsets; this partition reads its
        slice zero-copy."""
        prog = self.prog
        views = self._member_views(packed)
        summed: dict = {}
        for ex, *_ in views:
            for k, v in ex.items():
                summed[k] = summed.get(k, 0.0) + v
        self._global_prev_conv = summed.pop("__conv", float("inf"))
        g2 = {**g, **summed}
        slices = []
        for _, i, v, c, _, _ in views:
            if len(i):
                slices.append((i, v, c))
        if prog.reduce == "labelvote":
            if slices:
                idx = np.concatenate([s[0] for s in slices]).astype(np.int64)
                labs = np.concatenate([s[1] for s in slices])
                cnts = np.concatenate([s[2] for s in slices])
                ci, cl, cc = segops.label_count_combine(idx, labs, cnts)
                ui, uv = segops.label_vote(ci, cl, cc)
            else:
                ui = np.empty(0, np.int64)
                uv = np.empty(0, np.int64)
        elif slices:
            # each incoming slice is combiner-aggregated: its indices are
            # UNIQUE and sorted. Dense accumulate run-by-run (gather /
            # modify / scatter on L2-resident state) — no O(M log M)
            # sort of the concatenated message stream (which profiling
            # showed dominated the superstep)
            n_local = self.ctx.n_local
            v0 = slices[0][1]
            touched = np.zeros(n_local, bool)
            if prog.reduce == "sum":
                # float32-shipped partials accumulate in float64 — the
                # quantization is per shipped partial, not per add
                acc_dt = np.float64 if v0.dtype == np.float32 else v0.dtype
                dense = np.zeros((n_local,) + v0.shape[1:], acc_dt)
                for i, v, _ in slices:
                    dense[i] += v
                    touched[i] = True
            else:  # min
                if v0.dtype.kind == "f":
                    big = np.array(np.inf, v0.dtype)
                else:
                    big = np.array(np.iinfo(v0.dtype).max, v0.dtype)
                dense = np.full((n_local,) + v0.shape[1:], big, v0.dtype)
                for i, v, _ in slices:
                    dense[i] = np.minimum(dense[i], v)
                    touched[i] = True
            ui = np.flatnonzero(touched)
            uv = dense[ui]
        else:
            ui = np.empty(0, np.int64)
            uv = np.empty(0, np.float64)
        # deliver vertex-to-vertex messages (if any) before apply
        in_ids, in_vals = [], []
        for _, _, _, _, mi, mv in views:
            if mi is not None and len(mi):
                in_ids.append(mi)
                in_vals.append(mv)
        if in_ids:
            ids = np.concatenate(in_ids)
            vals = np.concatenate(in_vals, axis=0)
            pos = np.clip(np.searchsorted(self.verts, ids), 0, max(len(self.verts) - 1, 0))
            ok = (self.verts[pos] == ids) if len(self.verts) else np.zeros(len(ids), bool)
            self.ctx.inbox = (pos[ok], vals[ok])
        else:
            self.ctx.inbox = None
        self.ctx.changed_idx = None  # frontier programs re-set it in apply
        stats = prog.apply(self.ctx, ui, uv, g2)
        self._applied_iters = getattr(self, "_applied_iters", 0) + 1
        if prog.conv_tol is not None:
            self._last_conv = prog.conv_stat(stats)
        return stats

    def step(self, g: dict, packed_refs: list):
        """One fused superstep: apply incoming messages, then produce the
        next superstep's packed messages. Returns (local stats, packed).

        ``packed_refs`` is a plain list of ObjectRefs (NOT unpacked by
        Ray): the driver's submission cost stays O(1) per task instead of
        O(P) dependency args, and the actor's own ray.get provides the
        BSP wait (actor tasks are ordered, so no deadlock).

        Supersteps are submitted several-at-a-time by the driver; the
        object-store dependencies between step calls ARE the BSP barrier,
        so iteration latency is actor-to-actor, not driver round-trips.
        Once the piggybacked global convergence metric drops below
        conv_tol the step becomes a no-op (returns the cached packed
        messages — a fixpoint — and None stats), so pre-submitted
        overshoot iterations cost nothing.

        (A direct actor-to-actor mailbox exchange — the reference's
        hvr_mailbox design — was measured strictly slower here: P^2
        actor-call latency per superstep vs P task launches with shared
        zero-copy packed objects.)"""
        prog = self.prog
        if (
            prog.conv_tol is not None
            and self._global_prev_conv < prog.conv_tol
            and self._last_packed is not None
        ):
            return None, self._last_packed
        if packed_refs and isinstance(packed_refs[0], ray.ObjectRef):
            packed = ray.get(list(packed_refs))
        else:
            packed = packed_refs  # pre-merged list of packed dicts
        stats = self._gather_apply(g, packed)
        out = self.scatter_packed(g)
        return stats, out

    def combine_group(
        self,
        packed_refs: list,
        group_starts: list,
        mode: str = "concat",
        reduce: str | None = None,
    ):
        """Two-level exchange, level 1 (node-topology relay): merge this
        NODE GROUP's packed scatter outputs into one bundle per
        DESTINATION group (returned as ``num_returns=G`` values).

        ``mode="concat"`` (default) concatenates member slices — zero
        relay compute, BIT-exact vs flat. ``mode="reduce"`` additionally
        re-aggregates per destination vertex at the relay (the full
        mailbox-coalescing semantics): a dst vertex receiving from all
        M = P/G members of this group ships ONCE per (group pair)
        instead of M times, cutting cross-node message VOLUME up to Mx
        on hub-heavy graphs. Exact for 'min' and 'labelvote'; for 'sum'
        the relay accumulation reorders float adds (allclose, not
        bit-equal — quantified in tests). Vertex-to-vertex messages
        (m_ids) are never reduced (their combination is program-defined
        at the inbox).

        On a G-node cluster with P partitions this cuts per-superstep
        object pulls from P per partition (P^2 total; P*G cross-node
        object transfers, Ray dedups pulls per node) to P/G node-local
        pulls per relay + G pulls per partition (P + G*P total), and —
        because each bundle carries ONLY its destination group's
        slices — each message crosses the interconnect exactly once
        instead of landing on every node. This is the analogue of the
        reference's per-PE mailbox coalescing (reference
        src/hoover.cpp:1334-1340) lifted to node granularity; the design
        note at the top of this module records the round-4 single-node
        measurement (flat wins on one box, where 'pulls' are shared-
        memory ref resolutions — the relay hop only pays off across a
        real interconnect).

        Bundles CONCATENATE member slices (member-major, ascending
        partition order) rather than re-reducing them, so the gather's
        per-member accumulation order — and therefore every float bit —
        is identical to the flat exchange. Relay cost is M contiguous
        array copies per destination group; groups are contiguous
        partition ranges so each member contributes ONE slice per
        bundle."""
        packed = (
            ray.get(list(packed_refs))
            if packed_refs and isinstance(packed_refs[0], ray.ObjectRef)
            else packed_refs
        )
        gs = np.asarray(group_starts, np.int64)
        G = len(gs) - 1
        M = len(packed)
        extras_list = [pk["extras"] for pk in packed]
        has_c = any(pk["c"] is not None for pk in packed)
        any_m = any("m_ids" in pk for pk in packed)
        outs = []
        for h in range(G):
            a_p, b_p = int(gs[h]), int(gs[h + 1])
            n_dst = b_p - a_p
            off = np.zeros((M, n_dst + 1), np.int64)
            i_sl, v_sl, c_sl, q_sl = [], [], [], []
            base = 0
            for m, pk in enumerate(packed):
                a, b = int(pk["off"][a_p]), int(pk["off"][b_p])
                i_sl.append(pk["i"][a:b])
                v_sl.append(pk["v"][a:b])
                if has_c:
                    c_sl.append(
                        pk["c"][a:b]
                        if pk["c"] is not None
                        else np.empty(0, np.int64)
                    )
                if mode == "reduce":
                    widths = np.diff(np.asarray(pk["off"][a_p : b_p + 1]))
                    q_sl.append(np.repeat(np.arange(n_dst, dtype=np.int32), widths))
                off[m] = base + np.asarray(pk["off"][a_p : b_p + 1]) - a
                base += b - a
            i_cat = np.concatenate(i_sl)
            v_cat = np.concatenate(v_sl)
            c_cat = np.concatenate(c_sl) if has_c else None
            if mode == "reduce" and reduce in ("sum", "min", "labelvote") and base:
                q_cat = np.concatenate(q_sl)
                if reduce == "labelvote":
                    order = np.lexsort((v_cat, i_cat, q_cat))
                    q_o, i_o, l_o = q_cat[order], i_cat[order], v_cat[order]
                    c_o = c_cat[order]
                    new = np.r_[
                        True,
                        (q_o[1:] != q_o[:-1])
                        | (i_o[1:] != i_o[:-1])
                        | (l_o[1:] != l_o[:-1]),
                    ]
                    starts = np.flatnonzero(new)
                    i_cat, v_cat = i_o[starts], l_o[starts]
                    c_cat = np.add.reduceat(c_o, starts)
                    q_runs = q_o[starts]
                else:
                    order = np.lexsort((i_cat, q_cat))
                    q_o, i_o = q_cat[order], i_cat[order]
                    v_o = v_cat[order]
                    new = np.r_[True, (q_o[1:] != q_o[:-1]) | (i_o[1:] != i_o[:-1])]
                    starts = np.flatnonzero(new)
                    red = np.add if reduce == "sum" else np.minimum
                    i_cat = i_o[starts]
                    v_cat = red.reduceat(v_o, starts, axis=0)
                    q_runs = q_o[starts]
                # single pseudo-member row 0 carries the merged slices;
                # rows 1..M-1 are empty (their extras still ride in
                # extras_list, so global sums stay complete and ordered)
                off = np.zeros((M, n_dst + 1), np.int64)
                off[0] = np.searchsorted(q_runs, np.arange(n_dst + 1))
            bundle: dict = {
                "bundle": True,
                "dst_base": a_p,
                "i": i_cat,
                "v": v_cat,
                "c": c_cat,
                "off": off,
                "extras_list": extras_list,
            }
            if any_m:
                m_off = np.zeros((M, n_dst + 1), np.int64)
                mi_sl, mv_sl = [], []
                mbase = 0
                for m, pk in enumerate(packed):
                    if "m_ids" in pk:
                        a, b = int(pk["m_off"][a_p]), int(pk["m_off"][b_p])
                        mi_sl.append(pk["m_ids"][a:b])
                        mv_sl.append(pk["m_vals"][a:b])
                        m_off[m] = mbase + np.asarray(pk["m_off"][a_p : b_p + 1]) - a
                        mbase += b - a
                    else:
                        m_off[m] = mbase
                bundle["m_ids"] = (
                    np.concatenate(mi_sl) if mi_sl else np.empty(0, np.uint64)
                )
                bundle["m_vals"] = (
                    np.concatenate(mv_sl) if mv_sl else np.empty(0, np.float64)
                )
                bundle["m_off"] = m_off
            outs.append(bundle)
        return tuple(outs) if G > 1 else outs[0]

    # ---- results / checkpoint ---------------------------------------
    def state_table(self, id_col: str, columns: list[str], signed_ids: bool) -> pa.Table:
        ids = self.verts.view(np.int64) if signed_ids else self.verts
        cols = {id_col: pa.array(ids)}
        for c in columns:
            cols[c] = pa.array(self.ctx.state[c])
        return pa.table(cols)

    def export_state_matrix(self, key: str, signed_ids: bool) -> pa.Table:
        """Export a 2-D state matrix as (v, h0..h{d-1}) columns."""
        ids = self.verts.view(np.int64) if signed_ids else self.verts
        h = self.ctx.state[key]
        cols = {"v": pa.array(ids)}
        for j in range(h.shape[1]):
            cols[f"h{j}"] = pa.array(h[:, j])
        return pa.table(cols)

    def save_checkpoint(self, path: str, it: int) -> str:
        os.makedirs(path, exist_ok=True)
        cols = {"v": pa.array(self.verts)}
        for c, arr in self.ctx.state.items():
            cols[c] = pa.array(list(arr)) if arr.ndim == 2 else pa.array(arr)
        f = os.path.join(path, f"part-{self.pid:05d}.parquet")
        tmp = f + ".tmp"
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, f)
        return f

    def load_checkpoint(self, path: str) -> int:
        t = pq.read_table(os.path.join(path, f"part-{self.pid:05d}.parquet"))
        v = t.column("v").to_numpy().astype(np.uint64, copy=False)
        if len(v) != len(self.verts) or not np.array_equal(v, self.verts):
            raise RuntimeError(f"checkpoint partition {self.pid} does not match graph")
        for c in t.column_names:
            if c == "v":
                continue
            col = t.column(c)
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                # 2-D state matrix saved as a list column — stack the
                # rows back into an (n, d) float array
                self.ctx.state[c] = np.stack(col.to_numpy(zero_copy_only=False))
            else:
                self.ctx.state[c] = col.to_numpy().copy()
        return len(v)

    def applied_iters(self) -> int:
        """Number of supersteps actually applied by this actor (can run
        1+ ahead of the driver's logical count inside a burst)."""
        return getattr(self, "_applied_iters", 0)

    # ---- cross-engine state handoff (multi-phase algorithms) ----------
    # Two engines over the same vertex set with the same num_parts have
    # IDENTICAL per-partition vertex layouts (ownership is the static id
    # hash), so per-vertex state moves between them as one object-store
    # ref per partition — no driver materialization, no disk. Used by
    # forward-backward algorithms (SCC) where each phase runs on a
    # different edge orientation.

    def export_state(self, cols: list[str]) -> dict:
        return {c: self.ctx.state[c] for c in cols}

    def import_state(self, d: dict) -> None:
        for c, arr in d.items():
            self.ctx.state[c] = np.asarray(arr).copy()  # refs arrive read-only

    def map_state(self, fn) -> dict:
        """Apply ``fn(ctx) -> stats dict`` in place on this partition's
        state (the distributed epilogue step of a phase, e.g. 'assign
        scc = color where flagged')."""
        return fn(self.ctx)

    # ---- random walks (training-corpus generation) --------------------
    # DeepWalk/node2vec-style seeded walks over the partitioned CSR.
    # Walk state hops between partitions exactly like superstep messages;
    # each partition records the visits it hosts, so the corpus is
    # assembled fully distributed (from_arrow_refs, never the driver).

    def _walk_csr(self) -> None:
        """One-time dst-SORTED neighbor CSR: neighbor rank order is then
        independent of the partition count, so sampled walks are
        P-invariant (same property the tests assert for algorithms)."""
        if getattr(self, "_walk_dst", None) is None:
            by_src = np.repeat(
                np.arange(len(self.verts), dtype=np.int64),
                np.diff(self.src_indptr),
            )
            dsts = self.edge_dst[self.src_order]
            order = np.lexsort((dsts, by_src))
            self._walk_dst = dsts[order]

    @staticmethod
    def _walk_hash(v0, rep, t) -> np.ndarray:
        x = splitmix64(v0) ^ splitmix64(
            rep.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(t)
        )
        return splitmix64(x)

    def walks_start(self, n_per_vertex: int, seed: int):
        """Seed n_per_vertex walks at every local non-dangling vertex;
        record the step-0 visit; return the packed step-1 hops."""
        self._walk_csr()
        self._walk_seed = np.uint64(seed)
        live = np.flatnonzero(self.out_deg > 0)
        v0 = np.repeat(self.verts[live], n_per_vertex)
        rep = np.tile(np.arange(n_per_vertex, dtype=np.uint64), len(live))
        idx = np.repeat(live, n_per_vertex)
        self._walk_rows = [(v0, rep, np.zeros(len(v0), np.int32), self.verts[idx])]
        return self._walks_hop(v0, rep, idx, t=0)

    def _walks_hop(self, v0, rep, idx, t: int) -> dict:
        """Sample each walk's next vertex; pack hops by owner."""
        deg = self.out_deg[idx]
        h = self._walk_hash(v0 + self._walk_seed, rep, t)
        choice = (h % deg.astype(np.uint64)).astype(np.int64)
        nxt = self._walk_dst[self.src_indptr[idx] + choice]
        qp = part_of(nxt, self.P)
        order = np.argsort(qp, kind="stable")
        return {
            "v0": v0[order],
            "rep": rep[order],
            "dst": nxt[order],
            "off": np.searchsorted(qp[order], np.arange(self.P + 1)),
        }

    def walks_step(self, t: int, walk_len: int, *packed):
        """Receive step-t hops addressed to this partition, record the
        visits, terminate walks at dangling vertices or at walk_len,
        and emit the packed step-(t+1) hops."""
        v0s, reps, dsts = [], [], []
        for pk in packed:
            a, b = pk["off"][self.pid], pk["off"][self.pid + 1]
            if a < b:
                v0s.append(pk["v0"][a:b])
                reps.append(pk["rep"][a:b])
                dsts.append(pk["dst"][a:b])
        if not v0s:
            return self._walks_hop(
                np.empty(0, np.uint64), np.empty(0, np.uint64), np.empty(0, np.int64), t
            )
        v0 = np.concatenate(v0s)
        rep = np.concatenate(reps)
        dst = np.concatenate(dsts)
        self._walk_rows.append((v0, rep, np.full(len(v0), t, np.int32), dst))
        idx = np.searchsorted(self.verts, dst).astype(np.int64)
        alive = (self.out_deg[idx] > 0) & (t < walk_len)
        return self._walks_hop(v0[alive], rep[alive], idx[alive], t)

    # -- node2vec (second-order p/q-biased) walks -----------------------
    # Exact bias via distributed rejection sampling: the walk at `cur`
    # (with predecessor `prev`) samples a uniform candidate from N(cur),
    # and the CANDIDATE'S OWNER decides acceptance — on a SYMMETRIC
    # graph the node2vec membership test "cand in N(prev)" equals
    # "prev in N(cand)", which is a local binary search in the owner's
    # dst-sorted CSR. alpha = 1/p if cand == prev, 1 if common
    # neighbor, 1/q otherwise; accept iff u*alpha_max < alpha. Rejected
    # attempts bounce back to cur's owner for a resample (geometric
    # round count, capped at _N2V_TRIES_CAP — after the cap the
    # candidate is accepted; with p, q in the practical [0.25, 4]
    # range the cap fires with probability < (1 - 1/16)^64 ~ 1.6e-2
    # per hop at worst and the bias of the fallback is negligible).
    # (KnightKing-style rejection walking, Yang et al. SOSP'19 —
    # public algorithm, reimplemented on the packed exchange.)

    _N2V_NONE = np.uint64(0xFFFFFFFFFFFFFFFF)
    _N2V_TRIES_CAP = np.uint64(64)
    _N2V_COLS = ("typ", "v0", "rep", "t", "cur", "prev", "cand", "tries")

    @staticmethod
    def _n2v_hash(v0, rep, t, tries, salt: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            x = splitmix64(v0) ^ splitmix64(
                rep * np.uint64(0x9E3779B97F4A7C15)
                + t * np.uint64(0x100000001B3)
                + tries * np.uint64(1000003)
                + np.uint64(salt)
            )
        return splitmix64(x)

    def _n2v_member(self, ix: np.ndarray, prev: np.ndarray) -> np.ndarray:
        """Vectorized per-row lower-bound search: prev[i] in the
        dst-sorted neighbor segment of local vertex ix[i]."""
        dst = self._walk_dst
        lo = self.src_indptr[ix].astype(np.int64)
        hi = self.src_indptr[ix + 1].astype(np.int64)
        end = hi.copy()
        guard = max(len(dst) - 1, 0)
        while True:
            active = lo < hi
            if not active.any():
                break
            mid = (lo + hi) >> 1
            val = dst[np.where(active, mid, 0)]
            less = active & (val < prev)
            lo = np.where(less, mid + 1, lo)
            hi = np.where(active & ~less, mid, hi)
        if len(dst) == 0:
            return np.zeros(len(ix), bool)
        return (lo < end) & (dst[np.minimum(lo, guard)] == prev)

    def _n2v_sample(self, v0, rep, t, cur_idx, prev, tries) -> dict:
        """Uniform candidate from N(cur) -> type-1 attempt rows."""
        deg = self.out_deg[cur_idx].astype(np.uint64)
        h = self._n2v_hash(v0 + self._walk_seed, rep, t, tries, 11)
        cand = self._walk_dst[
            self.src_indptr[cur_idx] + (h % np.maximum(deg, 1)).astype(np.int64)
        ]
        return {
            "typ": np.ones(len(v0), np.uint8),
            "v0": v0,
            "rep": rep,
            "t": t,
            "cur": self.verts[cur_idx],
            "prev": prev,
            "cand": cand,
            "tries": tries,
        }

    def _n2v_pack(self, outs: list[dict]):
        if outs:
            rows = {c: np.concatenate([o[c] for o in outs]) for c in self._N2V_COLS}
        else:
            rows = {
                c: np.empty(0, np.uint8 if c == "typ" else np.uint64)
                for c in self._N2V_COLS
            }
        route = np.where(
            rows["typ"] == 1,
            part_of(rows["cand"], self.P),
            part_of(rows["cur"], self.P),
        )
        order = np.argsort(route, kind="stable")
        packed = {c: v[order] for c, v in rows.items()}
        packed["off"] = np.searchsorted(route[order], np.arange(self.P + 1))
        return packed, len(route)

    def n2v_start(self, n_per_vertex: int, seed: int, p: float, q: float):
        """Seed n_per_vertex node2vec walks per non-dangling vertex;
        record step-0 visits; return packed first-hop attempts (the
        first hop is first-order: prev = NONE sentinel, always accept)."""
        self._walk_csr()
        self._walk_seed = np.uint64(seed)
        self._n2v_alpha = (1.0 / p, 1.0 / q)
        live = np.flatnonzero(self.out_deg > 0)
        v0 = np.repeat(self.verts[live], n_per_vertex)
        rep = np.tile(np.arange(n_per_vertex, dtype=np.uint64), len(live))
        idx = np.repeat(live, n_per_vertex)
        self._walk_rows = [(v0, rep, np.zeros(len(v0), np.int32), self.verts[idx])]
        n = len(v0)
        attempt = self._n2v_sample(
            v0,
            rep,
            np.ones(n, np.uint64),
            idx,
            np.full(n, self._N2V_NONE, np.uint64),
            np.zeros(n, np.uint64),
        )
        return self._n2v_pack([attempt])[0]

    def n2v_step(self, walk_len: int, *packed):
        """One protocol round: resample bounced attempts I own (typ 0),
        accept/reject candidate attempts I own (typ 1); returns
        (next packed rows, rows in flight)."""
        parts: dict = {c: [] for c in self._N2V_COLS}
        for pk in packed:
            a, b = pk["off"][self.pid], pk["off"][self.pid + 1]
            if a < b:
                for c in self._N2V_COLS:
                    parts[c].append(pk[c][a:b])
        if not parts["v0"]:
            return self._n2v_pack([])
        rows = {c: np.concatenate(parts[c]) for c in self._N2V_COLS}
        outs = []
        mb = rows["typ"] == 0
        if mb.any():
            idx = np.searchsorted(self.verts, rows["cur"][mb]).astype(np.int64)
            outs.append(
                self._n2v_sample(
                    rows["v0"][mb],
                    rows["rep"][mb],
                    rows["t"][mb],
                    idx,
                    rows["prev"][mb],
                    rows["tries"][mb],
                )
            )
        ma = rows["typ"] == 1
        if ma.any():
            v0, rep, t, cur, prev, cand, tries = (
                rows[c][ma] for c in self._N2V_COLS[1:]
            )
            ix = np.searchsorted(self.verts, cand).astype(np.int64)
            a_ret, a_far = self._n2v_alpha
            amax = max(a_ret, 1.0, a_far)
            alpha = np.where(
                cand == prev,
                a_ret,
                np.where(self._n2v_member(ix, prev), 1.0, a_far),
            )
            alpha = np.where(prev == self._N2V_NONE, amax, alpha)
            u = (
                self._n2v_hash(v0 + self._walk_seed, rep, t, tries, 23).astype(
                    np.float64
                )
                / 2.0**64
            )
            acc = (u * amax < alpha) | (tries >= self._N2V_TRIES_CAP)
            if acc.any():
                av0, arep, at = v0[acc], rep[acc], t[acc]
                acand, aix, acur = cand[acc], ix[acc], cur[acc]
                self._walk_rows.append((av0, arep, at.astype(np.int32), acand))
                cont = (at < np.uint64(walk_len)) & (self.out_deg[aix] > 0)
                if cont.any():
                    outs.append(
                        self._n2v_sample(
                            av0[cont],
                            arep[cont],
                            at[cont] + np.uint64(1),
                            aix[cont],
                            acur[cont],
                            np.zeros(int(cont.sum()), np.uint64),
                        )
                    )
            rej = ~acc
            if rej.any():
                with np.errstate(over="ignore"):
                    outs.append(
                        {
                            "typ": np.zeros(int(rej.sum()), np.uint8),
                            "v0": v0[rej],
                            "rep": rep[rej],
                            "t": t[rej],
                            "cur": cur[rej],
                            "prev": prev[rej],
                            "cand": cand[rej],
                            "tries": tries[rej] + np.uint64(1),
                        }
                    )
        return self._n2v_pack(outs)

    def walks_collect(self) -> pa.Table:
        v0 = np.concatenate([r[0] for r in self._walk_rows])
        rep = np.concatenate([r[1] for r in self._walk_rows])
        step = np.concatenate([r[2] for r in self._walk_rows])
        v = np.concatenate([r[3] for r in self._walk_rows])
        self._walk_rows = []
        return pa.table(
            {
                "walk_v0": pa.array(v0.view(np.int64)),
                "walk_rep": pa.array(rep.astype(np.int64)),
                "step": pa.array(step.astype(np.int64)),
                "v": pa.array(v.view(np.int64)),
            }
        )


# --------------------------------------------------------------------------
# Loader helpers (Ray Data shuffle -> pinned actors)
# --------------------------------------------------------------------------


def _router(actors, P: int, symmetrize: bool, delete: bool = False):
    """map_batches fn: split each Arrow batch by owner partition and push
    the slices straight to the pinned actors (worker -> object store ->
    actor; the driver never sees the data, and no separate hash-shuffle
    materialization is needed — the actor-side accumulate IS the
    repartition-by-vertex-hash). With ``delete=True`` the slices are
    buffered edge deletions instead of inserts."""

    def fn(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy().astype(np.uint64, copy=False)
        d = batch.column("dst").to_numpy().astype(np.uint64, copy=False)
        if symmetrize:
            # hash each endpoint once; both directions' owner arrays are
            # concats of the same two hash results
            ps, pd_ = part_of(s, P), part_of(d, P)
            part = np.concatenate([ps, pd_])
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
        else:
            part = part_of(s, P) if len(s) else np.empty(0, np.int64)
        refs = []
        if len(s):
            order = np.argsort(part, kind="stable")
            s_, d_ = s[order], d[order]
            bounds = np.searchsorted(part[order], np.arange(P + 1))
            if delete:
                for q in range(P):
                    a, b = bounds[q], bounds[q + 1]
                    if a < b:
                        refs.append(
                            actors[q].add_del_chunk.remote(s_[a:b].copy(), d_[a:b].copy())
                        )
                ray.get(refs)
                return pa.table({"n": pa.array([len(s)], pa.int64())})
            # NOTE: dst ids are NOT routed to their owners here — owners
            # learn about them from the seg_udst index exchange at
            # finalize (they are exactly the incoming-message targets),
            # which halves the router's hash+sort+copy work
            for q in range(P):
                a, b = bounds[q], bounds[q + 1]
                if a < b:
                    refs.append(
                        actors[q].add_chunk.remote(s_[a:b].copy(), d_[a:b].copy(), None)
                    )
            ray.get(refs)
        return pa.table({"n": pa.array([len(s)], pa.int64())})

    return fn


@ray.remote(num_cpus=0.5)
def _route_block(fn, *tbls: pa.Table):
    tbl = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
    fn(tbl)
    return len(tbl)


@ray.remote(num_cpus=0.5)
def _route_slice(fn, tbl: pa.Table, j: int, k: int):
    """Route slice j of k of one (large) block — parallelizes the
    hash+sort+push work when the edge table has fewer blocks than the
    desired routing task count (a materialized table often arrives as
    ONE block; a single routing task serializes the whole load)."""
    n = len(tbl)
    a, b = n * j // k, n * (j + 1) // k
    if a < b:
        fn(tbl.slice(a, b - a))
    return b - a


# --------------------------------------------------------------------------
# Engine driver
# --------------------------------------------------------------------------


class SuperstepEngine:
    """Build partition-pinned graph state from an edge Dataset, then run
    vertex programs to convergence with checkpoint/resume + metrics."""

    def __init__(
        self,
        num_parts: int = 8,
        symmetrize: bool = False,
        dedup: bool = True,
        node_groups: int | None = None,
        node_combine: str = "concat",
    ):
        self.P = num_parts
        self.symmetrize = symmetrize
        self.dedup = dedup
        self.actors: list = []
        self.n_total = 0
        self.n_edges = 0
        self.signed_ids = False
        self._loaded = False
        # node-topology two-level exchange: partitions are split into
        # ``node_groups`` contiguous groups (each modeling one NODE of
        # the target cluster — on a real deployment, pair this with a
        # STRICT_SPREAD placement group so each group's actors share a
        # node); the first actor of each group relays the group's
        # scatter outputs as one bundle per destination group. Bit-exact
        # vs the flat exchange (see GraphPartition.combine_group). None/
        # <2 = flat (the right default on one node, measured round 4).
        if node_groups and node_groups >= 2:
            G = min(int(node_groups), self.P)
            self._group_starts = [round(g * self.P / G) for g in range(G + 1)]
        else:
            self._group_starts = None
        if node_combine not in ("concat", "reduce"):
            raise ValueError(node_combine)
        # "concat" = bit-exact vs flat; "reduce" = relay re-aggregates
        # per dst vertex (cross-node VOLUME cut up to P/G x on hub
        # graphs; exact for min/labelvote, allclose for float sums)
        self._node_combine = node_combine

    # ---- graph build -------------------------------------------------
    def provision(self, wait: bool = True) -> "SuperstepEngine":
        """Spawn the partition actors ahead of data arrival — the
        reference's PEs are long-running processes that exist before any
        edge streams in (srun launches them outside the measured insert
        window, test/update_rates.cpp); calling this first keeps actor
        spawn out of ingest timing. ``load_edges`` provisions implicitly
        when this wasn't called.

        The readiness barrier matters on a saturated/stolen host: worker
        spawn can exceed the raylet registration timeout and get reaped —
        if that happens to a partition actor after routing has begun, the
        load dies mid-flight. Waiting here surfaces spawn failures before
        any data moves and keeps the routing storm off the spawn path.

        With ``wait=False`` the handles are created but the readiness
        barrier is deferred to the next blocking ``provision()`` call
        (``load_edges`` always issues one), so actor spawn can overlap
        driver-side Dataset work — e.g. the sim loop computes its first
        radius_join while the partition actors come up."""
        if not self.actors:
            self.actors = [
                GraphPartition.remote(i, self.P, self.dedup) for i in range(self.P)
            ]
            self._provision_ready = False
        if wait and not getattr(self, "_provision_ready", True):
            ray.get([a.n_local.remote() for a in self.actors])
            self._provision_ready = True
        return self

    def load_edges(
        self,
        edges: Dataset,
        src_col: str = "src",
        dst_col: str = "dst",
        streaming: bool = False,
    ) -> "SuperstepEngine":
        """Route an edge Dataset into the partition actors and build the
        indexes. With ``streaming=True``, raw edges are retained so
        ``extend_edges`` can append further batches (the reference's
        incremental edge-insert loop, test/update_rates.cpp:31-56)."""
        assert not self._loaded, "engine already loaded"
        self.provision()
        schema = edges.schema()
        dtype = dict(zip(schema.names, schema.types))[src_col]
        self.signed_ids = pa.types.is_signed_integer(dtype)
        self.streaming = streaming
        self._route(edges, src_col, dst_col)
        self._finalize_and_index(keep_raw=streaming)
        self._loaded = True
        return self

    def transposed(self) -> "SuperstepEngine":
        """Build the reverse-orientation engine straight from this
        loaded engine's partition actors: each actor's per-destination
        segments are already grouped by the transpose owner, so the
        edges move actor -> actor in one push per matrix cell — skipping
        the swap map pass, the hash recompute and the Dataset routing a
        fresh ``load_edges`` would pay. Identical vertex ownership, so
        per-partition state refs (``export_state_refs`` /
        ``run(import_state=...)``) align between the two engines."""
        assert self._loaded, "call load_edges first"
        g = len(self._group_starts) - 1 if self._group_starts else None
        t = SuperstepEngine(
            num_parts=self.P,
            dedup=self.dedup,
            node_groups=g,
            node_combine=self._node_combine,
        ).provision()
        t.signed_ids = self.signed_ids
        t.streaming = False
        ray.get([a.push_transpose.remote(t.actors) for a in self.actors])
        t._finalize_and_index(keep_raw=False)
        t._loaded = True
        return t

    def prefetch_edges(
        self, edges: Dataset, src_col: str = "src", dst_col: str = "dst"
    ) -> "SuperstepEngine":
        """Start routing an upcoming batch WITHOUT finalizing: the route
        tasks' ``add_chunk`` appends only buffer on the actors, so they
        interleave harmlessly with a running program — the analogue of
        the reference's async mailbox ingest overlapping compute. A
        following ``extend_edges()`` (no argument) waits for the routing
        and rebuilds the indexes."""
        assert self._loaded and self.streaming, "load_edges(streaming=True) first"
        self._pending_route = self._route(edges, src_col, dst_col, wait=False)
        return self

    def extend_edges(
        self, edges: Dataset | None = None, src_col: str = "src", dst_col: str = "dst"
    ) -> "SuperstepEngine":
        """Append an edge batch (or the one started by
        ``prefetch_edges``) to a streaming-loaded graph and rebuild the
        indexes. Vertex state survives on the actors; the next
        ``run(..., warm_start=True)`` continues from it."""
        assert self._loaded and self.streaming, "load_edges(streaming=True) first"
        pending = getattr(self, "_pending_route", None)
        if edges is None:
            assert pending is not None, "prefetch_edges first or pass edges"
            ray.get(pending)
            self._pending_route = None
        else:
            if pending is not None:  # don't interleave: finish prefetch first
                ray.get(pending)
                self._pending_route = None
            self._route(edges, src_col, dst_col)
        self._finalize_and_index(keep_raw=True)
        return self

    def delete_edges(
        self,
        edges: Dataset,
        src_col: str = "src",
        dst_col: str = "dst",
        rebuild: bool = True,
    ) -> "SuperstepEngine":
        """Remove the given (src, dst) pairs from a streaming-loaded
        graph (both directions when the engine symmetrizes) and rebuild
        the indexes. Surviving vertices keep their state for
        ``warm_start`` runs — but note min-label programs (CC) are NOT
        warm-resumable across deletions (labels can only shrink); re-run
        them cold and the result matches a from-scratch build of the
        surviving graph. Reference: buffered deletes + update_edge_info,
        src/hoover.cpp:450-600, 2384-2418."""
        assert self._loaded and self.streaming, "load_edges(streaming=True) first"
        self._route(edges, src_col, dst_col, delete=True)
        if rebuild:
            self._finalize_and_index(keep_raw=True)
        return self  # rebuild=False: a following extend_edges rebuilds once

    def delete_vertices(self, ids) -> "SuperstepEngine":
        """Remove vertices and ALL their incident edges (broadcast
        invalidation: in-edges live on other partitions' actors —
        reference handle_deleted_vertex, src/hoover.cpp:1695-1733;
        behavior spec test/remove_vertices_test.c)."""
        assert self._loaded and self.streaming, "load_edges(streaming=True) first"
        arr = np.asarray(ids)
        arr = arr.view(np.uint64) if arr.dtype == np.int64 else arr.astype(np.uint64)
        ref = ray.put(arr)
        ray.get([a.add_vertex_deletions.remote(ref) for a in self.actors])
        self._finalize_and_index(keep_raw=True)
        return self

    def _route(
        self,
        edges: Dataset,
        src_col: str,
        dst_col: str,
        delete: bool = False,
        wait: bool = True,
    ):
        from ray.data.dataset import MaterializedDataset

        cols = edges
        if set(edges.schema().names) != {"src", "dst"} or src_col != "src":
            cols = edges.select_columns([src_col, dst_col]).map_batches(
                lambda t: t.rename_columns(["src", "dst"]), batch_format="pyarrow"
            )
        if isinstance(edges, MaterializedDataset):
            # delta batches (streaming inserts/deletes) are typically
            # already materialized: route their blocks with plain tasks —
            # skips ~1s of Dataset-pipeline fixed cost per batch, which
            # dominated streaming insert throughput. Blocks are coalesced
            # to ~256k-row groups so routing parallelizes while each task
            # still makes ~one add_chunk call per actor.
            fn = _router(self.actors, self.P, self.symmetrize, delete=delete)
            refs = cols.to_arrow_refs()
            n_groups = max(1, (edges.count() >> 17) + 1)
            if len(refs) >= n_groups:
                # many small blocks: coalesce to ~256k-row groups
                per = (len(refs) + n_groups - 1) // n_groups
                futs = [
                    _route_block.remote(fn, *refs[i : i + per])
                    for i in range(0, len(refs), per)
                ]
            else:
                # few big blocks (often ONE): split each into row-range
                # slices so the hash+sort+push work parallelizes
                k = (n_groups + len(refs) - 1) // len(refs)
                futs = [
                    _route_slice.remote(fn, r, j, k) for r in refs for j in range(k)
                ]
            if not wait:
                return futs
            ray.get(futs)
            return []
        sink = cols.map_batches(
            _router(self.actors, self.P, self.symmetrize, delete=delete),
            batch_format="pyarrow",
            batch_size=1 << 20,
        )
        sink.count()  # consume -> all add_chunk calls complete
        return []

    def _finalize_and_index(self, keep_raw: bool) -> None:
        """Rebuild indexes in exactly THREE pipelined actor rounds with
        zero driver-side payload fetches: finalize+seg export (phase 1),
        incoming-index build (phase 2), outgoing-index set. Every
        exchange cell is its own return object (``num_returns``), so the
        driver only transposes a P x P matrix of SMALL ObjectRefs; each
        cell's payload moves owner -> receiver exactly once (the old
        broadcast form deserialized all P lists on every actor — O(P^2)
        data movement, the documented large-P limit)."""
        P = self.P
        outs = [
            a.finalize_segs.options(num_returns=P + 2).remote(keep_raw)
            for a in self.actors
        ]
        meta_refs = [o[0] for o in outs]
        info_refs = [o[1] for o in outs]
        seg_refs = [o[2:] for o in outs]
        inc_outs = [
            self.actors[q]
            .build_incoming_index.options(num_returns=P + 2)
            .remote(*[seg_refs[p][q] for p in range(P)])
            for q in range(P)
        ]
        nloc_refs = [o[0] for o in inc_outs]
        added_refs = [o[1] for o in inc_outs]
        inc_refs = [o[2:] for o in inc_outs]
        done = [
            self.actors[p].set_outgoing_idx.remote(
                *[inc_refs[q][p] for q in range(P)],
                *[added_refs[q] for q in range(P)],
            )
            for p in range(P)
        ]
        sizes = ray.get(meta_refs)
        nloc = ray.get(nloc_refs)
        ray.get(done)
        infos = ray.get(info_refs)
        self.last_rebuild = {
            "mode": infos[0]["mode"],
            "batch_rows": int(sum(i["batch_rows"] for i in infos)),
            "max_actor_sec": max(i["sec"] for i in infos),
        }
        self.n_total = int(sum(nloc))
        self.n_edges = int(sum(s[1] for s in sizes))
        self.part_sizes = [(v, s[1]) for v, s in zip(nloc, sizes)]

    # ---- run ---------------------------------------------------------
    def run(
        self,
        prog: VertexProgram,
        max_iters: int = 50,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 5,
        resume: bool = False,
        burst_size: int | None = None,
        warm_start: bool = False,
        import_state: list | None = None,
        staleness: int = 0,
    ) -> dict:
        """Run to convergence. Returns summary metrics dict.

        Supersteps are submitted ``burst_size`` at a time as a pre-wired
        task DAG: each step's packed-message outputs are the next step's
        inputs, so the BSP barrier is object-store dependencies, not
        driver round-trips. The driver reads stats off the critical
        path at chunk boundaries. Pre-submitted supersteps past
        convergence no-op inside the actors (deterministic: the
        converged state is identical whatever the chunk alignment).
        Programs whose driver_step mutates the globals must set
        burst_safe=False (chunk size 1).

        ``staleness=s > 0`` enables BOUNDED-STALENESS execution — the
        analogue of the reference's asynchronous slack (its default
        mode; HVR_STRICT is the BSP we default to): step t applies its
        OWN partition's messages from step t-1 but REMOTE partitions'
        messages from step t-1-s, so a step's cross-partition
        dependency reaches s+1 steps back and the inter-partition
        critical path relaxes accordingly. Sound for contraction-map
        programs (PR family: same fixpoint, possibly more supersteps —
        Bertsekas-style asynchronous iteration); NOT for programs whose
        semantics need lockstep rounds (coloring, MIS). Deterministic
        (the stale generation is fixed, not raced), so runs reproduce.
        BSP (0) stays the default and the oracle-checked mode; flat
        exchange only."""
        assert self._loaded, "call load_edges first"
        P = self.P
        stats0 = ray.get(
            [a.init_program.remote(prog, self.n_total, warm_start) for a in self.actors]
        )
        if import_state is not None:
            # one ref per partition (from export_state_refs of an engine
            # with identical layout) — overwrites the named state columns
            # after init_state, before the first scatter
            ray.get(
                [a.import_state.remote(r) for a, r in zip(self.actors, import_state)]
            )
        g = prog.driver_init(stats0)
        start_iter = 0
        metrics_path = None
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            metrics_path = os.path.join(checkpoint_dir, "metrics.jsonl")
            if resume:
                start_iter, g = self._try_resume(checkpoint_dir, g)

        if not getattr(prog, "burst_safe", True):
            burst = 1
        else:
            burst = burst_size or (checkpoint_every if checkpoint_dir else 8)

        if staleness:
            assert self._group_starts is None, (
                "bounded staleness composes with the flat exchange only"
            )
        history: list[dict] = []
        converged = False
        it = start_iter
        logical_iters = start_iter
        t_run = time.perf_counter()
        packed = [a.scatter_packed.remote(g) for a in self.actors]
        hist = [packed] if staleness else []
        while it < max_iters and not converged:
            k = min(burst, max_iters - it)
            t0 = time.perf_counter()
            stats_futs = []
            for _ in range(k):
                if staleness and len(hist) > staleness:
                    old = hist[-1 - staleness]
                    pb = [
                        [
                            packed[j] if j == i else old[j]
                            for j in range(P)
                        ]
                        for i in range(P)
                    ]
                else:
                    pb = self._combine_packed(packed, reduce=prog.reduce)
                res = [
                    a.step.options(num_returns=2).remote(g, pb[i])
                    for i, a in enumerate(self.actors)
                ]
                stats_futs.append([r[0] for r in res])
                packed = [r[1] for r in res]
                if staleness:
                    hist.append(packed)
                    del hist[: -(staleness + 1)]
            all_stats = [ray.get(f) for f in stats_futs]
            dt = time.perf_counter() - t0
            for j, stats in enumerate(all_stats):
                if any(s is None for s in stats):
                    converged = True  # actors no-opped past convergence
                    break
                g, converged, m = prog.driver_step(stats, g, it + j)
                history.append(
                    {"iter": it + j, "sec": round(dt / k, 6), "edges": self.n_edges, **m}
                )
                logical_iters = it + j + 1
                if converged:
                    break
            it += k
            if checkpoint_dir:
                self._checkpoint(checkpoint_dir, logical_iters - 1, g, metrics_path, history)
                history = []
        wall = time.perf_counter() - t_run
        iters_run = it - start_iter
        return {
            "iterations": logical_iters,
            "converged": converged,
            "wall_sec": wall,
            "edges_per_sec": self.n_edges * max(iters_run, 1) / wall if wall > 0 else 0.0,
            "n_vertices": self.n_total,
            "n_edges": self.n_edges,
            # per-iteration driver metrics (flushed to metrics.jsonl and
            # truncated here when checkpointing)
            "history": history,
        }

    def _combine_packed(self, packed: list, reduce: str | None = None) -> list:
        """Exchange wiring for one superstep: map the P raw scatter refs
        to each actor's inbound list. Flat: every actor reads all P refs.
        Two-level: each group's relay actor (its first partition) merges
        the group's refs into G per-destination-group bundles; actor pid
        in group h then reads G bundle refs — [bundles[g][h] for g].
        The relay tasks are pre-wired into the same burst DAG as the
        steps (object-store dependencies, no driver round-trip)."""
        gs = self._group_starts
        if not gs:
            return [packed] * self.P
        G = len(gs) - 1
        bundles = []
        for gi in range(G):
            relay = self.actors[gs[gi]]
            refs = packed[gs[gi] : gs[gi + 1]]
            mode = self._node_combine
            if G > 1:
                outs = list(
                    relay.combine_group.options(num_returns=G).remote(
                        refs, gs, mode, reduce
                    )
                )
            else:
                outs = [relay.combine_group.remote(refs, gs, mode, reduce)]
            bundles.append(outs)
        per_actor = []
        for pid in range(self.P):
            h = int(np.searchsorted(np.asarray(gs), pid, side="right")) - 1
            per_actor.append([bundles[g][h] for g in range(G)])
        return per_actor

    # ---- checkpoint / resume ----------------------------------------
    def _checkpoint(self, ckdir: str, it: int, g: dict, metrics_path: str, rows: list[dict]):
        path = os.path.join(ckdir, f"iter={it:06d}")
        ray.get([a.save_checkpoint.remote(path, it) for a in self.actors])
        # actor-side applied counts can run ahead of the logical iter
        # label inside a burst (pre-submitted supersteps past
        # convergence); record them so the label reflects the state
        # actually saved (ADVICE round 1)
        applied = ray.get([a.applied_iters.remote() for a in self.actors])
        manifest = {
            "iter": it,
            "applied_iters": {"min": int(min(applied)), "max": int(max(applied))},
            "num_parts": self.P,
            "n_vertices": self.n_total,
            "n_edges": self.n_edges,
            "globals": _jsonable(g),
            "lineage": {"symmetrize": self.symmetrize, "signed_ids": self.signed_ids},
        }
        tmp = os.path.join(path, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "MANIFEST.json"))
        with open(metrics_path, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def _try_resume(self, ckdir: str, g: dict) -> tuple[int, dict]:
        best = None
        if os.path.isdir(ckdir):
            for d in sorted(os.listdir(ckdir)):
                mf = os.path.join(ckdir, d, "MANIFEST.json")
                if d.startswith("iter=") and os.path.exists(mf):
                    with open(mf) as f:
                        m = json.load(f)
                    if m.get("num_parts") == self.P:
                        best = (int(m["iter"]), m, os.path.join(ckdir, d))
        if best is None:
            return 0, g
        it, manifest, path = best
        ray.get([a.load_checkpoint.remote(path) for a in self.actors])
        g2 = dict(g)
        g2.update(manifest.get("globals", {}))
        return it + 1, g2

    # ---- results -----------------------------------------------------
    def export_state_refs(self, cols: list[str]) -> list:
        """One object-store ref per partition holding {col: ndarray} —
        hand to ``run(import_state=...)`` / ``import_state_refs`` of an
        engine with the same num_parts over the same vertex set."""
        return [a.export_state.remote(cols) for a in self.actors]

    def import_state_refs(self, refs: list) -> None:
        ray.get([a.import_state.remote(r) for a, r in zip(self.actors, refs)])

    def map_state(self, fn) -> list[dict]:
        """Run ``fn(ctx) -> stats`` on every partition's state in place;
        returns the per-partition stats."""
        return ray.get([a.map_state.remote(fn) for a in self.actors])

    def state_dataset(self, id_col: str = "v", columns: list[str] | None = None) -> Dataset:
        import ray.data

        prog_cols = columns or []
        refs = [
            a.state_table.remote(id_col, prog_cols, self.signed_ids)
            for a in self.actors
        ]
        return ray.data.from_arrow_refs(refs)

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
        self._loaded = False


def _jsonable(g: dict) -> dict:
    out = {}
    for k, v in g.items():
        if isinstance(v, (np.floating, np.integer)):
            v = v.item()
        out[k] = v
    return out
