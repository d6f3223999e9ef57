"""Pallas fused gather-score kernel for graph beam search.

The beam search's hot operation is "gather the E expanded parents' neighbor
vectors and dot them with the query" (SURVEY.md §7: 'gather neighbor ids from
the flattened HBM graph, masked fused-cosine'). XLA lowers that pattern as
gather -> materialize [B, E*M0, D] in HBM -> matmul, tripling HBM traffic and
running the scattered 2KB-row gather at <10% of peak bandwidth.

This kernel fuses it: the index uses a *neighbor-materialized* layout
``nbr_vecs [N, M0, D]`` (each node's neighbor vectors stored contiguously, a
64KB block in bf16), so one expanded parent is ONE contiguous DMA
HBM -> VMEM. Per grid step, BQ queries x E parents of DMAs are issued
back-to-back (deep outstanding queue), waited once, and scored in VMEM with an
MXU dot; only the [B, E*M0] similarity tile is written back. HBM traffic is
exactly the gathered bytes.

Shapes are static: ids [B, E] int32 (scalar-prefetched so DMA addresses are
known before the body runs), queries [B, D] f32, out [B, E*M0] f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_dot_kernel(
    ids_ref,      # [B, E] int32 (scalar prefetch, SMEM)
    q_ref,        # [BQ, D] VMEM block
    hbm_ref,      # [N, M0, D] in ANY/HBM
    out_ref,      # [BQ, E*M0] VMEM block
    buf,          # VMEM scratch [BQ*E*M0, D]
    sems,         # DMA semaphores (BQ*E,)
    *,
    bq: int,
    e: int,
    m0: int,
):
    step = pl.program_id(0)

    def dma(i, j):
        parent = ids_ref[step * bq + i, j]
        # One counting semaphore per query row, shared by its E copies (all
        # the same [M0, D] shape, so the E waits are symmetric): sflag space
        # caps semaphore arrays at 512 entries, which BQ*E can exceed for
        # wide rerank candidate sets (E=128).
        return pltpu.make_async_copy(
            hbm_ref.at[parent],
            buf.at[pl.ds((i * e + j) * m0, m0), :],
            sems.at[i],
        )

    for i in range(bq):
        for j in range(e):
            dma(i, j).start()
    for i in range(bq):
        for j in range(e):
            dma(i, j).wait()

    em = e * m0
    for i in range(bq):
        block = buf[pl.ds(i * em, em), :].astype(jnp.float32)  # [E*M0, D]
        qv = q_ref[pl.ds(i, 1), :]                             # [1, D] f32
        sims = jax.lax.dot_general(
            block, qv,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # [E*M0, 1]
        out_ref[pl.ds(i, 1), :] = sims.reshape(1, em)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def gather_dot(
    nbr_vecs: jax.Array,   # [N, M0, D]
    ids: jax.Array,        # [B, E] int32 parent ids (must be in-range)
    queries: jax.Array,    # [B, D]
    *,
    block_q: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Returns sims [B, E*M0] f32: dot of each query with the M0 neighbor
    vectors of each of its E expanded parents. ``block_q=0`` picks the largest
    power-of-two divisor of B up to 16."""
    n, m0, d = nbr_vecs.shape
    b, e = ids.shape
    if block_q == 0:
        # Largest power-of-two divisor of B whose VMEM scratch
        # (block_q * E * M0 * D * itemsize) stays under ~12 MB. Mosaic
        # requires the query block's sublane dim >= 8, so 8 is the floor —
        # an expansion too wide to fit 8 rows of scratch must shrink E
        # (HNSWIndex.search_ids clamps expand accordingly).
        budget = 12 << 20
        row_bytes = e * m0 * d * nbr_vecs.dtype.itemsize
        block_q = next(
            (bq for bq in sorted({16, 8, 4, 2, 1, b}, reverse=True)
             if b % bq == 0
             and (bq % 8 == 0 or bq == b)      # Mosaic sublane rule
             and (bq == 1 or bq * row_bytes <= budget)),
            None,
        )
        if block_q is None:
            raise ValueError(
                f"gather_dot: E={e} x M0={m0} x D={d} with B={b} has no "
                f"valid query block (Mosaic needs block_q % 8 == 0 or "
                f"block_q == B); reduce the expansion width"
            )
    assert b % block_q == 0, (b, block_q)
    em = e * m0

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_q,),
        in_specs=[
            pl.BlockSpec(
                (block_q, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block_q, em), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q * em, d), nbr_vecs.dtype),
            pltpu.SemaphoreType.DMA((block_q,)),
        ],
    )
    kernel = functools.partial(_gather_dot_kernel, bq=block_q, e=e, m0=m0)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, em), jnp.float32),
        interpret=interpret,
    )(ids, queries, nbr_vecs)


def gather_dot_reference(nbr_vecs, ids, queries):
    """XLA oracle used in kernel parity tests."""
    n, m0, d = nbr_vecs.shape
    b, e = ids.shape
    nv = nbr_vecs[ids].reshape(b, e * m0, d)
    return jnp.einsum(
        "bd,bmd->bm", queries.astype(nv.dtype), nv,
        preferred_element_type=jnp.float32,
    )
