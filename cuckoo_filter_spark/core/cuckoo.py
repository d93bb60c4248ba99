"""Vectorized single-node cuckoo filter (the per-partition kernel).

A from-scratch numpy implementation of a partial-key cuckoo filter
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", 2014)
with batch insert / contains / delete and a bucket-wise merge — the
same capability surface as the reference GPU kernels:

* batch insert w/ eviction chains — ``CuckooFilter.cuh:457-464,
  859-954,1029-1141`` (insertMany / tryInsertAtBucket /
  insertWithEvictionDFS / insert kernel)
* batch contains — ``CuckooFilter.cuh:518-523,1088-1098,1143-1155``
* batch delete (multiset semantics) — ``CuckooFilter.cuh:536-548,
  805-848,1106-1116,1157-1183``
* XOR alt-bucket policy (fp from upper hash bits, i1 from lower,
  i2 = i1 ^ (h(fp) & mask)) — ``bucket_policies.cuh:14-84``
* merge (union of same-geometry filters by re-inserting every
  stored fingerprint at its bucket or alt bucket) — generalizes the
  reference's disjoint multi-GPU union
  (``CuckooFilterMultiGPU.cuh:335-363,558-565``) into an
  associative-for-membership combine usable in tree reduction.

Design differences from the reference, deliberate and Spark-first:

* One writer per filter (a Spark partition), so the word-packed
  SWAR + CAS machinery (``CuckooFilter.cuh:224-346``,
  ``helpers.cuh:78-151``) is replaced by numpy array ops — numpy's
  vectorization over an (n, bucket_size) gather IS our SWAR.
* Buckets keep a "prefix-filled" invariant (occupied slots first,
  holes compacted on delete). Membership semantics only depend on
  the multiset of tags per bucket, so this is observationally
  identical to the reference's tag-dependent slot placement while
  making the batch-insert fully vectorizable.
* Metrics (inserts, kicks, failures) are always on — they feed the
  per-partition lineage the checkpoint layer records (the reference
  gates this behind ``CUCKOO_FILTER_COUNT_EVICTIONS``,
  ``CuckooFilter.cuh:706-726``).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

from cuckoo_filter_spark.config import DISP_SALT, EMPTY, FP_SALT, CuckooConfig
from cuckoo_filter_spark.hashing import chained_hash, chained_hash_scalar, xxhash64_u64

_MAGIC = b"CKFS"
#: magic, version, bits_per_tag, bucket_size, eviction policy,
#: bucket policy, pad, num_buckets, capacity, occupied, kicks,
#: failures, inserts
_HEADER = struct.Struct("<4sBBHBB6xQQQQQQ")
_POLICIES = ("dfs", "bfs")
_BUCKET_POLICIES = ("xor", "addsub")


def swar_params(bits_per_tag: int, bucket_size: int):
    """(words_per_bucket, lane_low_ones, lane_high_bits) when a
    bucket row is an integer number of 64-bit words; None otherwise.
    Mirrors the reference's SWAR word layout (``helpers.cuh:78-151``)."""
    if (bucket_size * bits_per_tag) % 64 != 0:
        return None
    f = bits_per_tag
    lanes = 64 // f
    low = np.uint64(sum(1 << (f * i) for i in range(lanes)))
    high = np.uint64(sum(1 << (f * i + f - 1) for i in range(lanes)))
    return (bucket_size * f) // 64, low, high


def probe_rows(
    buckets: np.ndarray, i1: np.ndarray, i2: np.ndarray, fp: np.ndarray,
    bits_per_tag: int, out: np.ndarray | None = None,
) -> np.ndarray:
    """Membership of ``fp[j]`` in row ``i1[j]`` or ``i2[j]`` of a
    (N, bucket_size) tag array — SWAR zero-in-word bithack
    (``CuckooFilter.cuh:290-346``) when the row is word-aligned,
    equality broadcast otherwise. Shared by the filter's own
    ``contains_many`` and the stacked-broadcast shard probe."""
    res = out if out is not None else np.empty(len(fp), dtype=bool)
    sw = swar_params(bits_per_tag, buckets.shape[1])
    if sw:
        wpb, low, high = sw
        words = buckets.view(np.uint64).reshape(len(buckets), wpb)
        rep = fp.astype(np.uint64) * low
        hit = None
        with np.errstate(over="ignore"):
            for idx in (i1, i2):
                for j in range(wpb):
                    x = words[idx, j] ^ rep
                    h = ((x - low) & ~x & high) != 0
                    hit = h if hit is None else (hit | h)
        res[:] = hit
    else:
        fpc = fp[:, None]
        np.logical_or(
            (buckets[i1] == fpc).any(axis=1),
            (buckets[i2] == fpc).any(axis=1),
            out=res,
        )
    return res


class CuckooFilter:
    """A deletable, mergeable membership sketch over uint64 keys."""

    __slots__ = (
        "config", "capacity", "num_buckets", "_mask",
        "buckets", "fill", "occupied", "kicks", "failures", "inserts",
        "_alt_tab", "_claim", "_win_scratch",
    )

    #: hot-path chunk size — keeps per-chunk temporaries L2-resident
    #: so random filter-array access (latency-bound, parallelizes) is
    #: the only DRAM traffic; streaming full-batch temporaries
    #: saturate the memory bus and kill multi-core scaling.
    CHUNK = 65536

    def __init__(self, capacity: int, config: CuckooConfig | None = None):
        self.config = config or CuckooConfig()
        self.capacity = int(capacity)
        self.num_buckets = self.config.num_buckets_for(capacity)
        self._mask = np.uint64(self.num_buckets - 1)
        self.buckets = np.zeros(
            (self.num_buckets, self.config.bucket_size), dtype=self.config.tag_dtype
        )
        # bucket_size <= 127 always, so one byte per bucket keeps the
        # fill vector 8x smaller in cache than int64
        self.fill = np.zeros(self.num_buckets, dtype=np.int8)
        self.occupied = 0   # occupancy counter (CuckooFilter.cuh:349-357)
        self.kicks = 0      # eviction count metric
        self.failures = 0   # inserts dropped after max_kicks
        self.inserts = 0    # attempted inserts
        self._alt_tab = None  # lazy h(fp) displacement table (f<=16)
        self._claim = None    # lazy per-bucket claim scratch (insert)
        self._win_scratch = None  # lazy per-bucket winner scratch (delete)

    # ------------------------------------------------------------------
    # addressing (XorAltBucketPolicy, bucket_policies.cuh:14-84)
    # ------------------------------------------------------------------

    def _fp_hash(self, fp: np.ndarray) -> np.ndarray:
        """h(fp) used for the alternate-bucket XOR displacement —
        the chained JVM-parity family (``hashing.chained_hash``)."""
        return chained_hash(fp.astype(np.uint64), DISP_SALT)

    def _displacement(self, fp: np.ndarray) -> np.ndarray:
        """Alt-bucket displacement per fingerprint: ``h(fp) & mask``
        (xor policy) or ``h(fp) % (nb/2)`` (addsub), via a
        precomputed 2^f-entry gather table when f <= 16 — the table
        is L2-resident (<=512 KB) and replaces a full avalanche hash
        per probe/insert/delete."""
        idt = self._index_dtype
        if self.config.bits_per_tag <= 16:
            if self._alt_tab is None:
                all_fp = np.arange(
                    1 << self.config.bits_per_tag, dtype=np.uint64
                )
                h = chained_hash(all_fp, DISP_SALT)
                if self.config.bucket_policy == "xor":
                    self._alt_tab = (h & self._mask).astype(idt)
                else:
                    bpb = self.num_buckets // 2
                    self._alt_tab = (h % np.uint64(bpb)).astype(idt)
            return self._alt_tab[fp.astype(np.int64)]
        h = self._fp_hash(np.asarray(fp))
        if self.config.bucket_policy == "xor":
            return (h & self._mask).astype(idt)
        return (h % np.uint64(self.num_buckets // 2)).astype(idt)

    def candidates(self, keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(i1, i2, fp) for each uint64 key.

        fp = upper-32-bits & tag_mask, 0 remapped to 1
        (bucket_policies.cuh:49-53). XOR policy: i1 = lower-32-bits
        & mask (:56-58), i2 = i1 ^ (h(fp) & mask) (:71-74). AddSub
        policy: i1 = lower-32-bits % (nb/2), block 0
        (bucket_policies.cuh:126-143)."""
        h = chained_hash(keys, FP_SALT)
        fp = ((h >> np.uint64(32)) & np.uint64(self.config.tag_mask)).astype(
            self.config.tag_dtype
        )
        fp[fp == EMPTY] = 1
        idt = self._index_dtype
        if self.config.bucket_policy == "xor":
            i1 = (h & self._mask).astype(idt)
        else:
            bpb = self.num_buckets // 2
            i1 = (
                (h & np.uint64(0xFFFFFFFF)) % np.uint64(bpb)
            ).astype(idt)
        i2 = self.alt_bucket(i1, fp)
        return i1, i2, fp

    @property
    def _index_dtype(self):
        """int32 bucket indices while they fit — halves the sort and
        gather traffic in the hot paths."""
        return np.int32 if self.num_buckets <= (1 << 31) else np.int64

    def alt_bucket(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """XOR: i ^ (h(fp) & mask) — self-inverse
        (bucket_policies.cuh:71-74). AddSub: block 0 adds
        h(fp) % (nb/2) and moves to block 1, block 1 subtracts and
        moves back — also an involution (bucket_policies.cuh:
        156-166)."""
        idx = np.asarray(idx)
        if idx.dtype.kind != "i":
            idx = idx.astype(self._index_dtype)
        d = self._displacement(np.asarray(fp))
        if self.config.bucket_policy == "xor":
            return idx ^ d
        bpb = self.num_buckets // 2
        return np.where(
            idx < bpb,
            ((idx + d) % bpb) + bpb,
            (idx - d) % bpb,
        )

    # ------------------------------------------------------------------
    # insert
    # ------------------------------------------------------------------

    def _place_batch(
        self, bucket_idx: np.ndarray, fp: np.ndarray
    ) -> np.ndarray:
        """Vectorized first-empty-slot placement of fp[j] into
        bucket_idx[j] for as many entries as fit; returns success
        mask. Intra-batch conflicts (several keys targeting one
        bucket) are resolved by ranking within the bucket group —
        the serial-equivalent of the reference's per-slot CAS race
        (``CuckooFilter.cuh:859-904``).
        """
        n = len(bucket_idx)
        if n == 0:
            return np.zeros(0, dtype=bool)
        b = self.config.bucket_size
        if self._claim is None:
            self._claim = np.empty(self.num_buckets, dtype=np.int64)
        claim = self._claim
        success = np.zeros(n, dtype=bool)
        pending = np.arange(n)
        # claim-scatter: each pass, every pending key scatters its
        # index into claim[bucket] (last writer wins — the serial
        # analog of the reference's CAS race) and winners take the
        # bucket's next free slot; keys whose bucket is already full
        # fail immediately (inserts never free slots). At most
        # bucket_size passes; cheaper than any sort-based grouping.
        for _ in range(b):
            if not pending.size:
                break
            pb = bucket_idx[pending]
            open_ = self.fill[pb] < b
            pending = pending[open_]
            if not pending.size:
                break
            pb = pb[open_]
            idxs = np.arange(len(pending))
            claim[pb] = idxs
            winpos = claim[pb] == idxs
            wins = pending[winpos]
            wb = pb[winpos]                 # unique buckets
            f = self.fill[wb].astype(np.intp)
            self.buckets[wb, f] = fp[wins]
            self.fill[wb] += 1
            success[wins] = True
            pending = pending[~winpos]
        return success

    def _bfs_relocate(self, cur: np.ndarray, tags: np.ndarray) -> np.ndarray:
        """One vectorized BFS lookahead pass (``CuckooFilter.cuh:
        967-1018``): among the first min(8, b/2) victims of each full
        bucket, move the first whose own alternate bucket has room,
        then claim its slot. Returns per-key placed mask; the rest
        fall back to the DFS chain, as in the reference."""
        b = self.config.bucket_size
        c = min(8, max(1, b // 2))
        n = len(cur)
        placed = np.zeros(n, dtype=bool)
        vict = self.buckets[cur[:, None], np.arange(c)[None, :]]  # (n, c)
        valt = self.alt_bucket(
            np.repeat(cur, c), vict.ravel()
        ).reshape(n, c)
        room = self.fill[valt] < b
        has = room.any(axis=1)
        idx = np.flatnonzero(has)
        if not idx.size:
            return placed
        choice = room.argmax(axis=1)[idx]
        # serialize same-bucket evictors: claim-scatter race (losers
        # fall back to the DFS chain, as in the reference)
        if self._claim is None:
            self._claim = np.empty(self.num_buckets, dtype=np.int64)
        claim = self._claim
        cb = cur[idx]
        seq = np.arange(len(cb))
        claim[cb] = seq
        win = claim[cb] == seq
        act, aslot = idx[win], choice[win]
        victims = self.buckets[cur[act], aslot].copy()
        ok = self._place_batch(valt[act, aslot], victims)
        moved = act[ok]
        self.buckets[cur[moved], aslot[ok]] = tags[moved]
        placed[moved] = True
        self.kicks += int(len(moved))
        return placed

    def _kick_insert_batch(
        self, i1: np.ndarray, i2: np.ndarray, fp: np.ndarray
    ) -> np.ndarray:
        """Vectorized eviction: all stuck keys run their DFS kick
        chains in lock-step rounds. Each round every pending key
        evicts one victim from its current (full) bucket — conflicts
        on the same (bucket, slot) are serialized across rounds —
        then victims try their alternate bucket via the vectorized
        placer. Semantically each key still performs the reference's
        DFS chain (``CuckooFilter.cuh:917-954``); only the
        interleaving differs, which membership cannot observe.

        Evictions never free slots and placements never target full
        buckets, so concurrent-round actions commute.
        """
        n = len(fp)
        cur = np.where((fp & 1).astype(bool), i1, i2).astype(np.int64)
        tag = fp.astype(self.config.tag_dtype).copy()
        kicks_done = np.zeros(n, dtype=np.int64)
        success = np.zeros(n, dtype=bool)
        pending = np.arange(n)
        b = self.config.bucket_size
        if self.config.eviction_policy == "bfs" and pending.size:
            placed = self._bfs_relocate(cur, tag)
            success |= placed
            pending = pending[~placed]
        while pending.size:
            if pending.size <= 512:
                # the tail: a handful of long chains would otherwise
                # cost hundreds of small lock-step numpy rounds —
                # run each remaining chain to completion scalar-side
                for j in pending:
                    success[j] = self._kick_chain_scalar(
                        int(cur[j]), int(tag[j]), int(kicks_done[j])
                    )
                break
            cp = cur[pending]
            slot = (tag[pending].astype(np.int64) + kicks_done[pending] * 7) & (b - 1)
            # serialize same-bucket evictors with the claim-scatter
            # race (losers just retry next round — WHICH key evicts
            # first is arbitrary, exactly like the reference's CAS):
            # O(k) vs the sort inside np.unique, which was ~20% of
            # insert wall time at 0.95 load
            if self._claim is None:
                self._claim = np.empty(self.num_buckets, dtype=np.int64)
            claim = self._claim
            idxs = np.arange(len(cp))
            claim[cp] = idxs
            win = claim[cp] == idxs
            act = pending[win]
            aslot = slot[win]
            victims = self.buckets[cur[act], aslot].copy()
            self.buckets[cur[act], aslot] = tag[act]
            tag[act] = victims
            kicks_done[act] += 1
            self.kicks += len(act)
            cur[act] = self.alt_bucket(cur[act], victims)
            placed = self._place_batch(cur[act], tag[act])
            success[act[placed]] = True
            # drop finished + exhausted chains
            alive = ~success[pending]
            exhausted = kicks_done[pending] >= self.config.max_kicks
            dead = alive & exhausted
            if dead.any():
                # chain exhausted: last displaced victim dropped, as in
                # the reference's failed DFS — net occupancy unchanged
                self.failures += int(dead.sum())
            pending = pending[alive & ~exhausted]
        return success

    def _kick_chain_scalar(self, cur: int, tag: int, kicks_done: int) -> bool:
        """One full DFS kick chain for a single key (the literal loop
        of ``CuckooFilter.cuh:917-954``), used for the small residual
        tail where per-round numpy overhead dominates."""
        b = self.config.bucket_size
        bmask = b - 1
        maxk = self.config.max_kicks
        buckets = self.buckets
        fill = self.fill
        xor_policy = self.config.bucket_policy == "xor"
        bpb = self.num_buckets // 2
        tab = None
        if self.config.bits_per_tag <= 16:
            self._displacement(np.array([1], dtype=np.uint64))  # build table
            tab = self._alt_tab
        k = kicks_done
        while k < maxk:
            f = int(fill[cur])
            if f < b:
                buckets[cur, f] = tag
                fill[cur] = f + 1
                return True
            slot = (tag + k * 7) & bmask
            victim = int(buckets[cur, slot])
            buckets[cur, slot] = tag
            tag = victim
            k += 1
            self.kicks += 1
            if tab is not None:
                d = int(tab[tag])
            else:
                d = int(self._displacement(np.array([tag], dtype=np.uint64))[0])
            if xor_policy:
                cur = cur ^ d
            elif cur < bpb:
                cur = ((cur + d) % bpb) + bpb
            else:
                cur = (cur - d) % bpb
        self.failures += 1
        return False

    def insert_many(self, keys: np.ndarray) -> np.ndarray:
        """Batch insert; returns per-key success (multiset semantics —
        duplicates each occupy a slot, ``tests/test_cuckoo_filter.cu:
        147-170``). Mirrors insertMany → insertKernel
        (``CuckooFilter.cuh:457-464,1119-1141``)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        return self._insert_chunked(len(keys), lambda lo, hi: self.candidates(keys[lo:hi]))

    def insert_packed(self, packed: np.ndarray) -> np.ndarray:
        """Insert from JVM-packed ``(i1 << bits_per_tag) | fp`` values
        (the pack-kernel layout of ``insertManySorted``,
        ``CuckooFilter.cuh:1185-1207``): the hashing already happened
        in whole-stage codegen, so the Python side is placement only."""
        packed = np.ascontiguousarray(packed, dtype=np.int64)
        f = self.config.bits_per_tag
        tag_mask = self.config.tag_mask

        def cand(lo, hi):
            pc = packed[lo:hi]
            fp = (pc & tag_mask).astype(self.config.tag_dtype)
            i1 = (pc >> f).astype(self._index_dtype)
            return i1, self.alt_bucket(i1, fp), fp

        return self._insert_chunked(len(packed), cand)

    def _insert_chunked(self, n: int, cand) -> np.ndarray:
        self.inserts += n
        if n == 0:
            return np.zeros(0, dtype=bool)
        success = np.zeros(n, dtype=bool)
        resid: list[np.ndarray] = []
        res_i1: list[np.ndarray] = []
        res_i2: list[np.ndarray] = []
        res_fp: list[np.ndarray] = []
        for lo in range(0, n, self.CHUNK):
            hi = min(lo + self.CHUNK, n)
            i1, i2, fp = cand(lo, hi)
            s = self._place_batch(i1, fp)
            rem = np.flatnonzero(~s)
            if rem.size:
                s2 = self._place_batch(i2[rem], fp[rem])
                s[rem[s2]] = True
                stuck = rem[~s2]
                if stuck.size:
                    resid.append(stuck + lo)
                    res_i1.append(i1[stuck])
                    res_i2.append(i2[stuck])
                    res_fp.append(fp[stuck])
            success[lo:hi] = s
        if resid:
            idxs = np.concatenate(resid)
            success[idxs] = self._kick_insert_batch(
                np.concatenate(res_i1), np.concatenate(res_i2),
                np.concatenate(res_fp),
            )
        self.occupied += int(success.sum())
        return success

    def add_many(self, keys: np.ndarray) -> None:
        """Mergeable-sketch protocol adapter (``sketch_agg`` builders
        call ``add_many``); the success mask is tracked in
        ``occupied``/``failures`` metrics."""
        self.insert_many(keys)

    def insert_many_sorted(self, keys: np.ndarray) -> np.ndarray:
        """Locality-optimized insert: sort the batch by primary bucket
        before placement (the in-batch analog of insertManySorted's
        radix sort, ``CuckooFilter.cuh:475-508``). Semantics differ
        only in intra-batch order, which membership can't observe."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        h = chained_hash(keys, FP_SALT)
        order = np.argsort(h & self._mask, kind="stable")
        out = np.zeros(len(keys), dtype=bool)
        out[order] = self.insert_many(keys[order])
        return out

    #: adaptiveInsert cutoff (reference: 2^29 keys switches to the
    #: sorted path, benchmark_common.cuh:113-126). MEASURED on CPU
    #: (BENCH/sorted_vs_unsorted.json): the in-batch sort costs more
    #: than the locality it buys at every size (0.63-0.81x) — the
    #: GPU's memory-coalescing win does not transfer to cache-
    #: hierarchy CPUs with chunked placement, so the adaptive path
    #: never switches by default.
    ADAPTIVE_SORT_THRESHOLD = 1 << 62

    def adaptive_insert(self, keys: np.ndarray) -> np.ndarray:
        """insert_many below the threshold, insert_many_sorted above
        (adaptiveInsert, ``benchmark_common.cuh:113-126``)."""
        if len(keys) >= self.ADAPTIVE_SORT_THRESHOLD:
            return self.insert_many_sorted(keys)
        return self.insert_many(keys)

    # ------------------------------------------------------------------
    # contains
    # ------------------------------------------------------------------

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Batch membership (``CuckooFilter.cuh:518-523,1143-1155``).

        Probe is the reference's SWAR zero-in-word bithack
        (``CuckooFilter.cuh:290-346``, ``helpers.cuh:78-151``)
        vectorized over the batch — see :func:`probe_rows` — in
        cache-resident chunks.
        """
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        n = len(keys)
        out = np.empty(n, dtype=bool)
        for lo in range(0, n, self.CHUNK):
            hi = min(lo + self.CHUNK, n)
            i1, i2, fp = self.candidates(keys[lo:hi])
            probe_rows(
                self.buckets, i1, i2, fp, self.config.bits_per_tag,
                out=out[lo:hi],
            )
        return out

    def count_many(self, keys: np.ndarray) -> np.ndarray:
        """Exact stored multiplicity per key: occurrences of the
        key's fingerprint across both candidate buckets — the
        counting-structure query the reference benchmarks against GQF
        (count returns in ``benchmark/fpr_benchmark.cu:294-348`` and
        per-k-mer count queries in ``benchmark/kmer_benchmark.cu:
        259-355``). Because inserts have multiset semantics (each
        duplicate occupies a slot), the returned count is the exact
        number of stored instances; like every partial-key structure
        it can over-count when a DIFFERENT key collides on both
        fingerprint and bucket pair (probability ≈ the membership
        FPR). Deletes decrement it (multiset ``delete_many``).
        Geometry bound: a key's copies can only occupy its two
        candidate buckets, so stored multiplicity saturates at
        2*bucket_size — size ``bucket_size`` >= half the largest
        expected multiplicity (a GQF counter has no such cap; it
        trades this for approximate membership on deletion)."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        n = len(keys)
        out = np.zeros(n, dtype=np.int64)
        for lo in range(0, n, self.CHUNK):
            hi = min(lo + self.CHUNK, n)
            i1, i2, fp = self.candidates(keys[lo:hi])
            self._count_rows(i1, i2, fp, out[lo:hi])
        return out

    def count_packed(self, packed_vals: np.ndarray) -> np.ndarray:
        """Counting query from JVM-packed ``(i1 << bits_per_tag) |
        fp`` values (hashing stays in codegen; see
        :meth:`insert_packed`)."""
        packed_vals = np.ascontiguousarray(packed_vals, dtype=np.int64)
        f = self.config.bits_per_tag
        tag_mask = self.config.tag_mask
        n = len(packed_vals)
        out = np.zeros(n, dtype=np.int64)
        for lo in range(0, n, self.CHUNK):
            pc = packed_vals[lo:min(lo + self.CHUNK, n)]
            fp = (pc & tag_mask).astype(self.config.tag_dtype)
            i1 = (pc >> f).astype(self._index_dtype)
            self._count_rows(i1, self.alt_bucket(i1, fp), fp,
                             out[lo:lo + len(pc)])
        return out

    def _count_rows(
        self, i1: np.ndarray, i2: np.ndarray, fp: np.ndarray,
        out: np.ndarray,
    ) -> None:
        """out[j] = multiplicity of fp[j] in buckets i1[j] ∪ i2[j]
        (i2 == i1 counted once — XOR displacement of 0 aliases the
        pair)."""
        fpc = fp[:, None]
        c1 = (self.buckets[i1] == fpc).sum(axis=1)
        c2 = (self.buckets[i2] == fpc).sum(axis=1)
        np.add(c1, np.where(i1 == i2, 0, c2), out=out, casting="unsafe")

    # ------------------------------------------------------------------
    # delete
    # ------------------------------------------------------------------

    def _remove_one(self, bucket: int, fp: int) -> bool:
        """Remove exactly one instance of fp from bucket, compacting
        to keep the prefix-fill invariant
        (tryRemoveAtBucket, ``CuckooFilter.cuh:805-848``)."""
        f = self.fill[bucket]
        row = self.buckets[bucket]
        hits = np.flatnonzero(row[:f] == fp)
        if hits.size == 0:
            return False
        hole = hits[0]
        last = f - 1
        row[hole] = row[last]
        row[last] = EMPTY
        self.fill[bucket] = last
        return True

    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Batch delete with multiset semantics: each successful
        delete removes one stored instance; deleting k duplicates
        removes up to k instances (``CuckooFilter.cuh:536-548,
        1157-1183``; ``tests/test_cuckoo_filter.cu:324-344``).

        Fully vectorized in lock-step rounds: each round picks one
        representative per pending (i1, fp) group, probes both
        buckets, and clears one matching slot per touched bucket
        (first toucher wins; the rest retry next round, exactly the
        serialization the reference's CAS race performs). A miss is
        final — removals never add tags to a bucket — so misses
        retire their key immediately. Duplicate deletes consume one
        stored instance per round.
        """
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        return self._delete_chunked(
            len(keys), lambda lo, hi: self.candidates(keys[lo:hi])
        )

    def delete_packed(self, packed_vals: np.ndarray) -> np.ndarray:
        """Delete from JVM-packed ``(i1 << bits_per_tag) | fp`` values
        (see :meth:`insert_packed`) — hashing stays in codegen."""
        packed_vals = np.ascontiguousarray(packed_vals, dtype=np.int64)
        f = self.config.bits_per_tag
        tag_mask = self.config.tag_mask

        def cand(lo, hi):
            pc = packed_vals[lo:hi]
            fp = (pc & tag_mask).astype(self.config.tag_dtype)
            i1 = (pc >> f).astype(self._index_dtype)
            return i1, self.alt_bucket(i1, fp), fp

        return self._delete_chunked(len(packed_vals), cand)

    def contains_packed(self, packed_vals: np.ndarray) -> np.ndarray:
        """Membership from JVM-packed ``(i1 << bits_per_tag) | fp``."""
        packed_vals = np.ascontiguousarray(packed_vals, dtype=np.int64)
        f = self.config.bits_per_tag
        tag_mask = self.config.tag_mask
        n = len(packed_vals)
        out = np.empty(n, dtype=bool)
        for lo in range(0, n, self.CHUNK):
            pc = packed_vals[lo:min(lo + self.CHUNK, n)]
            fp = (pc & tag_mask).astype(self.config.tag_dtype)
            i1 = (pc >> f).astype(self._index_dtype)
            probe_rows(
                self.buckets, i1, self.alt_bucket(i1, fp), fp,
                self.config.bits_per_tag, out=out[lo:lo + len(pc)],
            )
        return out

    def _delete_chunked(self, n: int, cand_fn) -> np.ndarray:
        if n == 0:
            return np.zeros(0, dtype=bool)
        success = np.zeros(n, dtype=bool)
        for clo in range(0, n, self.CHUNK):
            chi = min(clo + self.CHUNK, n)
            i1, i2, fp = cand_fn(clo, chi)
            packed = (i1.astype(np.uint64) << np.uint64(32)) | fp.astype(
                np.uint64
            )
            # ONE sort per chunk: `alive` holds original positions in
            # packed order, and subsetting preserves that order, so
            # every later round sees a still-sorted pending set and
            # pays zero sort cost (the per-round argsort used to be
            # the dominant delete cost — deletes ran at 0.7x insert
            # throughput)
            alive = np.argsort(packed, kind="stable")
            while alive.size:
                sa = alive
                pk = packed[sa]
                firsts = np.empty(len(pk), dtype=bool)
                firsts[0] = True
                np.not_equal(pk[1:], pk[:-1], out=firsts[1:])
                reps = sa[firsts]  # first pending instance per group
                b1, f = i1[reps], fp[reps]
                m1 = self.buckets[b1] == f[:, None]
                has1 = m1.any(axis=1)
                # probe the alternate bucket only for primary misses
                miss1 = np.flatnonzero(~has1)
                b2m = i2[reps[miss1]]
                m2 = self.buckets[b2m] == f[miss1][:, None]
                has2 = m2.any(axis=1)
                found = has1.copy()
                found[miss1] = has2
                retired = np.zeros(chi - clo, dtype=bool)
                retired[reps[~found]] = True  # miss is final
                cand = np.flatnonzero(found)
                if cand.size:
                    tb = b1.copy()
                    tslot = m1.argmax(axis=1)
                    tb[miss1] = b2m
                    tslot[miss1[has2]] = m2[has2].argmax(axis=1)
                    tb = tb[cand]
                    tslot = tslot[cand]
                    # one removal per bucket per round — pick ANY
                    # single winner per bucket (losers just retry
                    # next round, so which one wins is irrelevant):
                    # scatter-then-readback is O(k) vs the sort
                    # inside np.unique, and the scratch needs no
                    # init because only indices written this round
                    # are read back
                    scr = self._win_scratch
                    if scr is None or scr.size < self.num_buckets:
                        scr = np.empty(self.num_buckets, dtype=np.intp)
                        self._win_scratch = scr
                    seq = np.arange(tb.size)
                    scr[tb] = seq
                    win = scr[tb] == seq
                    db = tb[win]
                    ds = tslot[win]
                    lasts = self.fill[db].astype(np.intp) - 1
                    self.buckets[db, ds] = self.buckets[db, lasts]
                    self.buckets[db, lasts] = EMPTY
                    self.fill[db] = lasts.astype(np.int8)
                    winners = reps[cand[win]]
                    success[clo + winners] = True
                    retired[winners] = True
                alive = alive[~retired[alive]]
        removed = int(success.sum())
        self.occupied -= removed
        return success

    # ------------------------------------------------------------------
    # metrics / lifecycle
    # ------------------------------------------------------------------

    def clear(self) -> None:
        """memset parity (``CuckooFilter.cuh:675-682``)."""
        self.buckets.fill(EMPTY)
        self.fill.fill(0)
        self.occupied = self.kicks = self.failures = self.inserts = 0

    @property
    def slot_capacity(self) -> int:
        return self.num_buckets * self.config.bucket_size

    def load_factor(self) -> float:
        """occupied / capacity — note the reference divides by the
        *requested* capacity in tests (``tests/test_cuckoo_filter.cu:
        101-124`` asserts lf == inserted/capacity), while
        ``CuckooFilter.cuh:688-690`` divides by slot capacity; we
        expose both."""
        return self.occupied / float(self.capacity)

    def slot_load_factor(self) -> float:
        return self.occupied / float(self.slot_capacity)

    def count_occupied_slots(self) -> int:
        """Full-scan verification (``CuckooFilter.cuh:759-785``)."""
        return int(np.count_nonzero(self.buckets))

    def size_in_bytes(self) -> int:
        return self.buckets.nbytes

    def metrics(self) -> dict:
        return {
            "occupied": self.occupied,
            "inserts": self.inserts,
            "kicks": self.kicks,
            "failures": self.failures,
            "num_buckets": self.num_buckets,
            "bucket_size": self.config.bucket_size,
            "bits_per_tag": self.config.bits_per_tag,
            "capacity": self.capacity,
        }

    # ------------------------------------------------------------------
    # merge (mergeable-sketch contract for tree reduction)
    # ------------------------------------------------------------------

    def merge_in_place(self, other: "CuckooFilter") -> "CuckooFilter":
        """Fold ``other`` into ``self`` by re-inserting every stored
        fingerprint at its current bucket or that bucket's alt —
        valid because the XOR displacement is self-inverse, so a tag
        seen in bucket i belongs to pair {i, alt(i, tag)} regardless
        of which was its i1. Membership answers are invariant to the
        merge order as long as no insert fails (tests assert this
        across random orderings). Generalizes the disjoint multi-GPU
        union (``CuckooFilterMultiGPU.cuh:558-565``)."""
        same_geom = (
            self.num_buckets == other.num_buckets
            and self.config.bits_per_tag == other.config.bits_per_tag
            and self.config.bucket_size == other.config.bucket_size
            and self.config.bucket_policy == other.config.bucket_policy
        )
        if not same_geom:
            raise ValueError("can only merge filters with identical geometry")
        bi, slot = np.nonzero(other.buckets)
        tags = other.buckets[bi, slot]
        alt = self.alt_bucket(bi.astype(np.int64), tags)
        success = self._place_batch(bi.astype(np.int64), tags)
        rem = ~success
        if rem.any():
            success[rem] = self._place_batch(alt[rem], tags[rem])
            rem = ~success
        if rem.any():
            idxs = np.flatnonzero(rem)
            success[idxs] = self._kick_insert_batch(
                bi[idxs].astype(np.int64), alt[idxs], tags[idxs]
            )
        self.occupied += int(success.sum())
        self.inserts += other.inserts
        self.kicks += other.kicks
        self.failures += other.failures
        return self

    # ------------------------------------------------------------------
    # serialization (shard blob exchanged between Spark stages)
    # ------------------------------------------------------------------

    #: Blob format version. v1 used the xxhash64+FINGERPRINT_SEED
    #: family; v2 probes with the chained FP_SALT/DISP_SALT family,
    #: so v1 blobs MUST be rejected (probing them with the new family
    #: yields false negatives). v3 keeps the v2 hash family and adds
    #: a 1-byte payload-layout flag after the header: 0 = dense
    #: bucket table (v2 payload), 1/2 = sparse (uint32/uint64 bucket
    #: indices + stored tags) — the format partial-aggregation blobs
    #: ship when the table is mostly empty. v2 blobs (same family)
    #: remain readable.
    BLOB_VERSION = 3
    _LAYOUT_DENSE, _LAYOUT_SPARSE32, _LAYOUT_SPARSE64 = 0, 1, 2

    def to_bytes(self) -> bytes:
        """Serialize, choosing the smaller of the dense table and the
        sparse (bucket_idx, tag) listing. A stage-1 partial sketch in
        ``grouped_sketch_partial`` holds ~1/num_partitions of one
        group's keys in a table sized for the whole group — dense
        shipping made the stage-2 shuffle
        partitions x groups x full-filter-bytes; sparse blobs scale
        with what the partial actually stores."""
        hdr = _HEADER.pack(
            _MAGIC, self.BLOB_VERSION, self.config.bits_per_tag,
            self.config.bucket_size,
            _POLICIES.index(self.config.eviction_policy),
            _BUCKET_POLICIES.index(self.config.bucket_policy),
            self.num_buckets, self.capacity, self.occupied, self.kicks,
            self.failures, self.inserts,
        )
        stored = self.count_occupied_slots()
        idx_dtype = np.uint32 if self.num_buckets <= 0xFFFFFFFF else np.uint64
        tag_bytes = self.buckets.dtype.itemsize
        sparse_cost = 8 + stored * (np.dtype(idx_dtype).itemsize + tag_bytes)
        if sparse_cost < self.buckets.nbytes:
            bi, slot = np.nonzero(self.buckets)
            layout = (
                self._LAYOUT_SPARSE32
                if idx_dtype is np.uint32
                else self._LAYOUT_SPARSE64
            )
            return (
                hdr
                + bytes([layout])
                + struct.pack("<Q", stored)
                + bi.astype(idx_dtype).tobytes()
                + self.buckets[bi, slot].tobytes()
            )
        return hdr + bytes([self._LAYOUT_DENSE]) + self.buckets.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        magic, ver, f, b, pol, bpol, nb, cap, occ, kicks, fails, inserts = (
            _HEADER.unpack_from(blob)
        )
        if magic != _MAGIC:
            raise ValueError("bad cuckoo filter blob")
        if ver not in (2, cls.BLOB_VERSION):
            raise ValueError(
                f"cuckoo blob version {ver} not supported (expected "
                f"{cls.BLOB_VERSION}; the hash family changed — rebuild "
                "the filter from source keys)"
            )
        cfg = CuckooConfig(
            bits_per_tag=f, bucket_size=b, eviction_policy=_POLICIES[pol],
            bucket_policy=_BUCKET_POLICIES[bpol],
        )
        flt = cls.__new__(cls)
        flt.config = cfg
        flt.capacity = cap
        flt.num_buckets = nb
        flt._mask = np.uint64(nb - 1)
        if ver == 2:  # legacy dense payload, no layout byte
            layout, off = cls._LAYOUT_DENSE, _HEADER.size
        else:
            layout, off = blob[_HEADER.size], _HEADER.size + 1
        if layout == cls._LAYOUT_DENSE:
            flt.buckets = (
                np.frombuffer(blob, dtype=cfg.tag_dtype, offset=off)
                .reshape(nb, b)
                .copy()
            )
            flt.fill = np.count_nonzero(flt.buckets, axis=1).astype(np.int8)
        else:
            idx_dtype = (
                np.uint32 if layout == cls._LAYOUT_SPARSE32 else np.uint64
            )
            (stored,) = struct.unpack_from("<Q", blob, off)
            off += 8
            bi = np.frombuffer(
                blob, dtype=idx_dtype, count=stored, offset=off
            ).astype(np.int64)
            off += stored * np.dtype(idx_dtype).itemsize
            tags = np.frombuffer(
                blob, dtype=cfg.tag_dtype, count=stored, offset=off
            )
            flt.buckets = np.zeros((nb, b), dtype=cfg.tag_dtype)
            # bi is sorted (np.nonzero is row-major): slot within each
            # bucket = position minus the bucket run's start
            if stored:
                starts = np.r_[
                    0, np.flatnonzero(np.diff(bi)) + 1
                ]
                counts = np.diff(np.r_[starts, stored])
                slot = np.arange(stored) - np.repeat(starts, counts)
                flt.buckets[bi, slot] = tags
            flt.fill = np.count_nonzero(flt.buckets, axis=1).astype(np.int8)
        flt._alt_tab = None
        flt._claim = None
        flt._win_scratch = None
        flt.occupied, flt.kicks, flt.failures, flt.inserts = occ, kicks, fails, inserts
        return flt

    @classmethod
    def merge_blobs(cls, blobs) -> "CuckooFilter":
        """Merge serialized shards (driver-side or inside treeReduce)."""
        it = iter(blobs)
        acc = cls.from_bytes(next(it))
        for b in it:
            acc.merge_in_place(cls.from_bytes(b))
        return acc
