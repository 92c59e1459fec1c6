"""Multi-device mapping: data-parallel reads and reference-sharded genomes.

TPU-native replacement for the reference's parallelism stack (SURVEY.md
§2.9): pthreads + semaphores become a ``jax.sharding.Mesh`` with a ``data``
axis (reads; the --nproc/--stride analog) and a ``ref`` axis (genome
shards; the automated version of the reference's documented
"split reference into multiple files and merge results" guidance for
>4 Gbp genomes, utils/SAWriter.cpp:186-193).

  * data axis: the batch dimension of ``map_batch`` is sharded; XLA
    partitions every kernel with no communication (reads are independent).
  * ref axis: each shard holds a contiguous genome slice + its k-mer
    index; every read runs the full anchor->chain->align pipeline against
    the local slice; per-shard candidate alignments are then
    ``all_gather``-ed over the ref axis and the global best selected —
    deterministically, since scores are integers and ties break on
    (shard, candidate) order.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blasr_tpu.index.genome import GenomeIndex, build_kmer_index
from blasr_tpu.pipeline.map_read import (
    COL_DPSLOT, COL_NANCH, COL_NCLIP, COL_SCORE, COL_TE, COL_TS, COL_VALID,
    N_COLS,
    DeviceIndex, PackedBatch, map_batch)


def make_mesh(n_data: int, n_ref: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_ref, (
        f"need {n_data * n_ref} devices, have {len(devices)}")
    arr = np.array(devices[: n_data * n_ref]).reshape(n_data, n_ref)
    return Mesh(arr, ("data", "ref"))


def map_batch_data_parallel(mesh: Mesh, index: DeviceIndex, reads, read_len,
                            submat, gap_costs, **static):
    """Pure data parallelism: reads sharded over the 'data' axis, index
    replicated.  XLA inserts no collectives — the per-read pipeline is
    embarrassingly parallel, like the reference's per-ZMW thread loop."""
    dshard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    reads = jax.device_put(reads, dshard)
    read_len = jax.device_put(read_len, dshard)
    index = jax.tree.map(lambda x: jax.device_put(x, repl), index)
    return map_batch(index, reads, read_len,
                     jax.device_put(submat, repl),
                     jax.device_put(gap_costs, repl), **static)


def shard_index(gi: GenomeIndex, n_shards: int, overlap: int = 65536
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split the genome into n_shards contiguous slices (with right-overlap
    so alignments near boundaries are found by exactly one shard... the
    overlap region's anchors are indexed by the left shard only up to
    slice end; candidates crossing the cut are recovered by the overlap).

    Returns stacked per-shard arrays, padded to common sizes:
      genomes  int8  [S, Gs]
      keys     uint32[S, Ms]
      pos      int32 [S, Ms]  (positions are *global* genome coordinates)
      offsets  int64 [S]      global start of each slice
    """
    g = gi.genome
    n = len(g)
    base = -(-n // n_shards)
    slices, offs = [], []
    for s in range(n_shards):
        lo = s * base
        hi = min(n, lo + base + overlap)
        lo_c = min(lo, n)
        slices.append(g[lo_c:hi])
        offs.append(lo_c)
    gs = max(len(x) for x in slices)
    genomes = np.full((n_shards, gs), 4, dtype=np.int8)
    keys_l, pos_l = [], []
    for s, sl in enumerate(slices):
        genomes[s, : len(sl)] = sl
        k, p = build_kmer_index(sl, gi.k)
        keys_l.append(k)
        pos_l.append(p.astype(np.int64) + offs[s])
    ms = max(len(k) for k in keys_l)
    keys = np.full((n_shards, ms), np.uint32(0xFFFFFFFF), dtype=np.uint32)
    pos = np.zeros((n_shards, ms), dtype=np.int32)
    for s in range(n_shards):
        keys[s, : len(keys_l[s])] = keys_l[s]
        pos[s, : len(pos_l[s])] = pos_l[s]
    return genomes, keys, pos, np.asarray(offs, dtype=np.int64)


def map_batch_ref_sharded(
    mesh: Mesh,
    gi: GenomeIndex,
    reads: np.ndarray,
    read_len: np.ndarray,
    submat, gap_costs,
    **static,
):
    """Reference-sharded mapping over mesh axes (data, ref).

    Each (data, ref) device runs the full pipeline for its read shard
    against its genome shard; results are all-gathered over 'ref' and the
    global top candidates selected per read.  This is SURVEY.md §2.9's
    'index sharding' row made automatic.
    """
    n_ref = mesh.shape["ref"]
    genomes, keys, pos, offs = shard_index(gi, n_ref)
    starts = np.asarray(gi.seqdb.starts, np.int32)
    ends = np.asarray(gi.seqdb.starts + gi.seqdb.lengths, np.int32)

    C = static["C"]

    def per_shard(genome_s, keys_s, pos_s, off_s, reads_s, rlen_s):
        # strip leading shard axes added by shard_map
        genome_s = genome_s[0]
        keys_s = keys_s[0]
        pos_s = pos_s[0]
        off_s = off_s[0]
        # positions in pos_s are global; convert to local-slice coords for
        # window gathering, report back global.  A sentinel N is prepended
        # (map_batch's coordinate convention, see DeviceIndex.from_host).
        genome_sent = jnp.concatenate(
            [jnp.full((1,), 4, genome_s.dtype), genome_s])
        local_pos = (pos_s - off_s).astype(jnp.int32) + 1
        off32 = off_s.astype(jnp.int32)
        idx = DeviceIndex(
            genome=genome_sent,
            keys_sorted=keys_s,
            pos_sorted=local_pos,
            contig_starts=jnp.maximum(starts - off32, 0) + 1,
            contig_ends=jnp.clip(ends - off32, 0, genome_s.shape[0]) + 1,
            k=gi.k,
        )
        res = map_batch(idx, reads_s, rlen_s, submat, gap_costs, **static)
        # global coordinates
        off_col = jnp.zeros((N_COLS,), jnp.int32).at[COL_TS].set(1).at[
            COL_TE].set(1) * off_s.astype(jnp.int32)
        ints = res.ints + jnp.where(res.ints[..., COL_VALID:COL_VALID + 1] > 0,
                                    off_col, 0)
        # gather every shard's candidates, keep global top-C by score
        g_ints = jax.lax.all_gather(ints, "ref", axis=0)   # [R, 2B, C, N_COLS]
        g_ops = jax.lax.all_gather(res.ops, "ref", axis=0)

        n_shards = g_ints.shape[0]
        n_dp, t_len = res.ops.shape
        # translate per-shard dp slots into rows of the concatenated ops
        slot = g_ints[..., COL_DPSLOT]
        slot_global = jnp.where(
            slot >= 0,
            slot + jnp.arange(n_shards, dtype=jnp.int32)[:, None, None] * n_dp,
            -1)
        g_ints = g_ints.at[..., COL_DPSLOT].set(slot_global)
        nanch = jnp.sum(g_ints[..., COL_NANCH], axis=0)    # psum over shards
        nclip = jnp.sum(g_ints[..., COL_NCLIP], axis=0)
        merged = jnp.moveaxis(g_ints, 0, 1).reshape(
            g_ints.shape[1], n_shards * C, N_COLS)         # [2B, R*C, cols]
        key = jnp.where(merged[..., COL_VALID] > 0,
                        merged[..., COL_SCORE], jnp.int32(0x3FFFFFFF))
        order = jnp.argsort(key, axis=1, stable=True)[:, :C]
        top = jnp.take_along_axis(merged, order[..., None], axis=1)
        top = top.at[..., COL_NANCH].set(nanch[:, :1])
        top = top.at[..., COL_NCLIP].set(nclip[:, :1])
        # merge cluster lists: union over shards, keep the heaviest
        # gate-passing clusters (ClusterList analog stays fixed-width)
        g_cl = jax.lax.all_gather(res.clusters, "ref", axis=0)
        c_stat = res.clusters.shape[1]
        mcl = jnp.moveaxis(g_cl, 0, 1).reshape(
            g_cl.shape[1], n_shards * c_stat, 2)
        ckey = jnp.where(mcl[..., 1] > 0, -mcl[..., 0],
                         jnp.int32(0x3FFFFFFF))
        corder = jnp.argsort(ckey, axis=1, stable=True)[:, :c_stat]
        top_cl = jnp.take_along_axis(mcl, corder[..., None], axis=1)
        return PackedBatch(ints=top, ops=g_ops.reshape(n_shards * n_dp, t_len),
                           clusters=top_cl)

    from jax import shard_map
    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("ref"), P("ref"), P("ref"), P("ref"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(jnp.asarray(genomes), jnp.asarray(keys), jnp.asarray(pos),
              jnp.asarray(offs), jnp.asarray(reads), jnp.asarray(read_len))
