"""Pallas fused distance + exact k-NN kernel for TPU.

The hot op of the whole framework (SURVEY.md §7 hard part 1): every train
step and every reconstruction query chunk runs kNN against 10k-60k points.
XLA's `lax.top_k` lowers to a full bitonic sort over N (~0.9 s for 50k
queries x 60k points on v5e) and its reshape+reduce layouts for two-stage
selection are unpredictable (measured up to 3.3 s). This kernel controls
the loop structure explicitly:

stage 1: stream 8-block groups through VMEM, computing exact f32 distances
         with direct elementwise differences and materializing only
         per-block minima — the (TQ, N) distance matrix never exists.
stage 2: select the k blocks with smallest block-min per query by k-pass
         min extraction over the tiny (nb, TQ) block-min array. Exact: if
         a true k-nearest element lay in an unselected block, the k
         selected blocks would each contain an element no larger than it.
stage 3: gather each query's selected blocks with a one-hot f32 MXU matmul
         (regular compute instead of irregular memory gathers), recompute
         the distances, and extract the final k nearest by iterative min
         extraction over the (k*S, TQ) candidates.

Data layout (Mosaic-constraint-driven; each rule below was learned from a
real miscompile or compile error on v5e):
- points arrive coordinate-major as (4, Npad): x, y, z rows plus a 4th
  "padding" row w = sqrt(penalty), so padded points acquire d2 += penalty
  with no separate mask array; lane-dim slices land on 128 boundaries
  (1-D arrays demand 1024-aligned dynamic offsets — avoided entirely).
- a transposed block-major f32 copy (4*S, nb) feeds the one-hot gather.
  The gather matmul must be f32/HIGHEST: every bf16 dot variant silently
  dropped low mantissa bits inside this kernel on v5e.
- every loop-carried write is a row store at a dynamic *sublane* position
  (`ref[i, :]`); dynamic lane-offset stores and in-loop dynamic sublane
  *reads* are never used (rows are selected with dense masked reductions).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 128  # points per block (lane width)
PAD_PENALTY = 1e12  # w = sqrt(penalty); finite so 0*w stays 0 in matmuls


def _knn_kernel(q_ref, pts_cm_ref, pts_blk_t_ref, aabb_ref, out_ref, ok_ref,
                bm_ref, blkids_ref, cand_ref, *,
                k: int, nb: int, tq: int, kb: int, aabb: bool):
    """One query tile.

    q (TQ, 3); pts_cm (4, NB*S) coordinate-major; pts_blk_t (4*S, NB)
    transposed block-major f32. out (k, TQ) — transposed by the caller. Scratch: bm
    (NB, TQ), blkids (kb_full, TQ), cand (kb_full*S, TQ). Global point ids
    are reconstructed from blkids at extraction time (no candi buffer),
    which halves the candidate VMEM footprint.

    Banded mode (kb < min(k, nb)): stage 3 first gathers only the kb best
    blocks per query — on Morton-ordered clouds with Morton-ordered query
    tiles the true k-NN lie in a handful of spatially compact blocks, so
    the expensive one-hot gather shrinks ~(k/kb)x. Exactness is certified
    per query: tau_k (k-th smallest candidate distance) must not exceed
    `bound`, the smallest block-min among unselected blocks — if it did, an
    unselected block could hold a closer point. Tiles with any failing
    query redo the gather with the unconditionally exact kb_full blocks.
    ok_ref row 0 reports the per-query certificate, row 1 whether the tile
    took the fallback (diagnostics only; results are exact either way).
    """
    q = q_ref[:]  # (TQ, 3)

    # ---- stage 1: block minima, 8 blocks per pass ----
    # distances via direct elementwise differences on the VPU: exact f32.
    # (A HIGHEST-precision MXU matmul here was observed to lose ~1e-3 on
    # this shape under Mosaic, silently reordering near-tied blocks.)
    G = 8  # blocks per group; nb is padded to a multiple of 8 by the caller
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]

    def block_min_group(jg, _):
        p4 = pts_cm_ref[:, pl.ds(pl.multiple_of(jg * (G * S), G * S), G * S)]
        dx = p4[0:1, :] - qx  # (TQ, G*S)
        dy = p4[1:2, :] - qy
        dz = p4[2:3, :] - qz
        d2 = dx * dx + dy * dy + dz * dz + p4[3:4, :] * p4[3:4, :]
        mins = [
            jnp.min(d2[:, g * S : (g + 1) * S], axis=1) for g in range(G)
        ]
        bm_ref[pl.ds(pl.multiple_of(jg * G, G), G), :] = jnp.stack(mins, axis=0)
        return 0

    qxT = q[:, 0][None, :]  # (1, TQ)
    qyT = q[:, 1][None, :]
    qzT = q[:, 2][None, :]
    nbrow = jax.lax.broadcasted_iota(jnp.int32, (nb, tq), 0)

    def gather_block_d2(slot, bid):
        """One-hot gather block `bid` ((TQ,) or scalar) into cand rows
        [slot*S, slot*S + S) as recomputed exact d2. The matmul must be
        f32/HIGHEST — see the precision note in fill_slot."""
        onehot_t = (nbrow == bid).astype(jnp.float32)  # (NB, TQ)
        g = jax.lax.dot_general(
            pts_blk_t_ref[:], onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (4*S, TQ): [x|y|z|w] block-major rows
        gx = g[0 * S : 1 * S, :]
        gy = g[1 * S : 2 * S, :]
        gz = g[2 * S : 3 * S, :]
        gw = g[3 * S : 4 * S, :]
        d2 = (gx - qxT) ** 2 + (gy - qyT) ** 2 + (gz - qzT) ** 2 + gw * gw
        cand_ref[pl.ds(pl.multiple_of(slot * S, S), S), :] = d2  # (S, TQ)

    if aabb:
        # ---- stage 1 (AABB variant): per-block LOWER BOUNDS instead of
        # true block minima. aabb_ref (6*nb, tq) holds pre-broadcast block
        # AABB planes (lox,loy,loz,hix,hiy,hiz); lb = squared distance of
        # the query to the box. ~100x fewer VPU ops than the brute pass
        # (12 vs ~1150 per (block, query)). Every downstream use of bm is
        # still a valid lower bound for any point in the block, so the
        # stage-2 selection + stage-3 certificate stay exact; only the
        # FALLBACK needs true minima (recomputed there) because its
        # "k blocks each contain a closer point" argument needs them.
        zero = jnp.float32(0)
        tx = jnp.maximum(
            jnp.maximum(aabb_ref[0 * nb : 1 * nb, :] - qxT,
                        qxT - aabb_ref[3 * nb : 4 * nb, :]), zero)
        ty = jnp.maximum(
            jnp.maximum(aabb_ref[1 * nb : 2 * nb, :] - qyT,
                        qyT - aabb_ref[4 * nb : 5 * nb, :]), zero)
        tz = jnp.maximum(
            jnp.maximum(aabb_ref[2 * nb : 3 * nb, :] - qzT,
                        qzT - aabb_ref[5 * nb : 6 * nb, :]), zero)
        bm_ref[:] = tx * tx + ty * ty + tz * tz

    else:
        jax.lax.fori_loop(0, nb // G, block_min_group, 0)

    # ---- stage 2: best blocks per query ----
    kb_full = min(k, nb)  # unconditionally exact block count
    kb1 = min(kb, kb_full)  # primary (banded) block count
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, tq), 0)

    def pick_block(i, bm):  # bm: (nb, tq)
        m = jnp.min(bm, axis=0, keepdims=True)  # (1, TQ)
        idx = jnp.min(jnp.where(bm <= m, row, nb), axis=0)  # (TQ,)
        blkids_ref[i, :] = idx
        return jnp.where(row == idx[None, :], jnp.float32(PAD_PENALTY * 4), bm)

    bm_after = jax.lax.fori_loop(0, kb1, pick_block, bm_ref[:])
    # exactness bound: smallest block-min among blocks NOT in the primary
    # band (any point there has d2 >= bound)
    bound = jnp.min(bm_after, axis=0)  # (TQ,)

    # ---- stage 3: one-hot gather selected blocks, recompute distances ----
    # transposed throughout: candidates live as (kb*S, TQ) so every
    # loop-carried store is an aligned dynamic-*sublane* row store —
    # dynamic lane-offset stores were observed to miscompile under Mosaic.
    srow_kb = jax.lax.broadcasted_iota(jnp.int32, (kb_full, tq), 0)

    def make_fill_slot(blkids_all):  # blkids_all: (kb_full, TQ) value
      def fill_slot(s, _):
        # row s of blkids via dense masked reduction (dynamic sublane reads
        # inside the loop miscompiled on some Mosaic versions)
        bid = jnp.sum(jnp.where(srow_kb == s, blkids_all, 0), axis=0)  # (TQ,)
        # one-hot gather as an f32 HIGHEST matmul. NOTE: every bf16
        # variant of this dot (stacked hi/lo, two separate exact-product
        # dots) silently lost low mantissa bits *inside this kernel* on
        # v5e, despite being exact in an isolated pallas test — do not
        # change this without re-running the large-N exactness check.
        gather_block_d2(s, bid[None, :])
        return 0

      return fill_slot

    srow = jax.lax.broadcasted_iota(jnp.int32, (kb_full, tq), 0)

    def extract(nblocks, blkids, need_tau):
        """k-pass min extraction over the first nblocks*S candidate rows.

        Mutates cand_ref IN PLACE (extracted entries are masked to
        PAD_PENALTY*4 directly in the scratch buffer). The r4 version
        carried the candidate slab by value through the fori_loop, which
        Mosaic double-buffers: at the fallback's kb_full=192/tq=256 that
        alone was ~75 MB of scoped VMEM and OOMed the 100 MiB cap
        (BENCH_r04). In-place masking keeps one resident copy; the only
        loop carry is the (tq,) tau vector when need_tau.
        """
        ncand = nblocks * S
        crow = jax.lax.broadcasted_iota(jnp.int32, (ncand, tq), 0)

        def body():
            cand = cand_ref[0:ncand, :]
            m = jnp.min(cand, axis=0, keepdims=True)
            pos = jnp.min(jnp.where(cand <= m, crow, ncand), axis=0)  # (TQ,)
            sel = crow == pos[None, :]
            # global id = blkids[pos // S, q] * S + pos % S, via a dense
            # sublane reduction (no per-lane gather)
            slot = pos // S  # (TQ,)
            blk = jnp.sum(jnp.where(srow == slot[None, :], blkids, 0), axis=0)
            cand_ref[0:ncand, :] = jnp.where(
                sel, jnp.float32(PAD_PENALTY * 4), cand
            )
            return m[0, :], blk * S + pos % S

        if need_tau:
            def pick(i, _):
                m, ids = body()
                out_ref[i, :] = ids
                return m  # final carry = k-th extracted distance = tau_k

            return jax.lax.fori_loop(
                0, k, pick, jnp.zeros((tq,), jnp.float32)
            )

        def pick_plain(i, _):
            _, ids = body()
            out_ref[i, :] = ids
            return 0

        jax.lax.fori_loop(0, k, pick_plain, 0)
        return None

    blkids1 = blkids_ref[:]  # (kb_full, TQ); rows >= kb1 only valid later
    jax.lax.fori_loop(0, kb1, make_fill_slot(blkids1), 0)
    tau = extract(kb1, blkids1, need_tau=kb1 < kb_full)

    if kb1 >= kb_full:
        # full band: unconditionally exact, no fallback (row 1 stays 0)
        ok_ref[:] = jnp.concatenate(
            [jnp.ones((1, tq), jnp.int32), jnp.zeros((7, tq), jnp.int32)],
            axis=0,
        )
        return

    ok = tau <= bound  # per-query exactness certificate
    tile_ok = jnp.all(ok)
    ok_ref[:] = jnp.concatenate(
        [
            ok[None, :].astype(jnp.int32),
            jnp.broadcast_to(
                jnp.logical_not(tile_ok).astype(jnp.int32)[None, None], (1, tq)
            ),
            jnp.zeros((6, tq), jnp.int32),
        ],
        axis=0,
    )

    @pl.when(jnp.logical_not(tile_ok))
    def _fallback():
        # redo with the unconditionally exact block set. The exactness
        # argument (k selected blocks each contain an element <= any
        # element of an unselected block) needs TRUE block minima — under
        # the AABB stage 1 bm_ref holds lower bounds, so recompute them
        # here (the brute pass runs only for certificate-failing tiles).
        if aabb:
            jax.lax.fori_loop(0, nb // G, block_min_group, 0)
        # bm_ref was never mutated by stage 2 (it carries by value), so
        # re-picking from scratch rebuilds blkids rows 0..kb1 (identically
        # in the non-AABB case) and extends to kb_full; the primary
        # extraction consumed cand rows, so refill everything.
        jax.lax.fori_loop(0, kb_full, pick_block, bm_ref[:])
        blkids2 = blkids_ref[:]  # fresh read: all kb_full rows valid now
        jax.lax.fori_loop(0, kb_full, make_fill_slot(blkids2), 0)
        extract(kb_full, blkids2, need_tau=False)


def _topk_rows_kernel(d2_ref, out_ref, *, k: int, kc: int, tq: int):
    """One column tile: positions of the k smallest of kc rows per column,
    ascending, ties broken by lowest position — the `extract` pattern of
    the kNN kernel (min + masked-iota argmin + mask), which matches
    `lax.top_k(-d2, k)[1]` semantics exactly."""
    crow = jax.lax.broadcasted_iota(jnp.int32, (kc, tq), 0)

    def pick(i, cand):
        m = jnp.min(cand, axis=0, keepdims=True)  # (1, TQ)
        pos = jnp.min(jnp.where(cand <= m, crow, kc), axis=0)  # (TQ,)
        out_ref[i, :] = pos
        return jnp.where(crow == pos[None, :], jnp.float32(PAD_PENALTY * 4),
                         cand)

    jax.lax.fori_loop(0, k, pick, d2_ref[:])


@functools.partial(jax.jit, static_argnames=("k", "tq", "interpret"))
def topk_rows_pallas(d2t, k: int, tq: int = 512, interpret: bool = False):
    """Per-column k-smallest positions over a small row count.

    d2t: (kc, C) f32 — kc candidate distances per query (column-major so
    every extraction pass is a cross-sublane reduction, the layout the kNN
    kernel's stage 3 already proved out on Mosaic). Returns (k, C) int32
    positions in [0, kc), ascending by (value, position) — bit-identical
    to `jax.lax.top_k(-d2, k)[1].T`.

    Exists because XLA lowers top_k over (C, 192) to a full variadic sort:
    62 ms per 50k x 192 call on v5e, called once per bisection iteration
    by the candidate refinement (tools/ablate_refine.py). This kernel's k
    extraction passes over a (192, tq) VMEM block are ~2 ms.

    Value-range precondition: all finite inputs must be < PAD_PENALTY*2
    (2e12) — extracted entries are masked to PAD_PENALTY*4 and pad rows
    sit at PAD_PENALTY*2, so larger legitimate values would collide with
    the masks and yield duplicate/wrong positions. Fine for squared
    distances on normalized clouds (the only caller); do not feed
    unbounded data.
    """
    kc, c = d2t.shape
    pad_r = (-kc) % 8  # sublane multiple; pad rows never win the min
    pad_c = (-c) % tq
    d2p = jnp.pad(d2t, ((0, pad_r), (0, pad_c)),
                  constant_values=jnp.float32(PAD_PENALTY * 2))
    kcp = kc + pad_r
    grid = (c + pad_c) // tq
    out = pl.pallas_call(
        functools.partial(_topk_rows_kernel, k=k, kc=kcp, tq=tq),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((kcp, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, tq), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, c + pad_c), jnp.int32),
        interpret=interpret,
    )(d2p)
    return out[:, :c]


VMEM_CAP_BYTES = 100 * 1024 * 1024  # raised scoped-VMEM cap (v5e: 128 MiB)


def _vmem_bytes(k: int, nb: int, npad: int, tq: int, aabb_on: bool) -> int:
    """Scoped-VMEM footprint model for one _knn_kernel invocation.

    Counts every buffer the kernel keeps resident: scratch (cand slab, bm,
    blkids), the pipelined inputs (query tile double-buffered; the
    constant-indexed cloud copies once, sublane/lane-padded to Mosaic
    tiles), outputs double-buffered, plus one cand-sized slack term for the
    in-place extraction's read-modify-write temporaries and the stage-1
    group distance temps. Calibrated against the r4 OOM (the value-carried
    extract measured 105.65 MB at k=192/tq=256 where static buffers were
    ~31 MB) and the r5 device compile of the in-place version.
    """
    kbf = min(k, nb)
    cand = kbf * S * tq * 4
    bm = nb * tq * 4
    blkids = kbf * tq * 4
    q_in = 2 * tq * 128 * 4  # (tq, 3) lane-pads to 128
    pts_cm = 8 * npad * 4  # (4, npad) sublane-pads to 8
    pts_blk_t = 4 * S * _ceil_to(nb, 128) * 4
    aabb_in = 6 * nb * tq * 4 if aabb_on else 8 * tq * 4
    outs = 2 * (k + 8) * tq * 4
    temps = cand + 4 * tq * 8 * S * 4  # extract RMW + stage-1 d2 group temps
    return (cand + bm + blkids + q_in + pts_cm + pts_blk_t
            + aabb_in + outs + temps)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def clamp_tile(k: int, n: int, tq: int, aabb_on: bool = False) -> int:
    """Largest query tile <= tq whose kernel footprint fits the VMEM cap.

    `tq` (from default_tile) is an upper bound; the actual tile shrinks by
    powers of two (floor 128) until the _vmem_bytes model fits with ~8%
    headroom. knn_pallas_single applies this internally, so callers can
    never compile an over-budget kernel (the r4 failure mode: k=192/tq=256
    at nb=472 OOMed at 105.65 MB inside the measured bench window).
    """
    npad = n + (-n) % (8 * S)
    nb = npad // S
    while tq > 128 and _vmem_bytes(k, nb, npad, tq, aabb_on) > int(
        VMEM_CAP_BYTES * 0.92
    ):
        tq //= 2
    return tq


def default_tile(k: int) -> int:
    """Upper-bound query-tile size (clamp_tile shrinks it to fit VMEM).

    Must be a multiple of 128 (the transposed output's lane width). The
    kernel is per-op-overhead-bound (many small sequential extraction
    passes), so bigger tiles amortize it: tq=256 measured 3.9x faster than
    tq=128 at k=64/kb=16 on v5e (53 ms vs 205 ms for 50k x 60k), and
    tq=512 another ~15% over tq=256 at k=64/kb=12 (r4, same-window,
    transfer-size-matched). The in-place extraction (r5) keeps one
    candidate slab resident, so k=192/tq=256 now fits (~59 MB modeled);
    k>192 (e.g. 200-NN patch ablations) starts at 128.
    """
    if k <= 64:
        return 512
    return 256 if k <= 192 else 128


@functools.partial(
    jax.jit,
    static_argnames=("k", "tq", "kb", "return_stats", "interpret", "aabb"),
)
def knn_pallas_single(points, queries, valid, k: int, tq: int = 128,
                      kb: int = 0, return_stats: bool = False,
                      interpret: bool = False, aabb: bool = False):
    """Exact kNN ids (Q, k) for one cloud.

    points: (N, 3) f32; valid: (N,) bool mask (True = real point) or None;
    queries: (Q, 3) f32. Padding to block multiples happens here.

    kb > 0 enables the banded stage 3 (gather only the kb best blocks per
    query, certified exact with an in-kernel fallback). Results are exact
    for ANY point order, but the band only pays off when `points` is
    spatially sorted (Morton order) and queries are sorted too — otherwise
    most tiles take the fallback and the extra pass is pure overhead.
    return_stats additionally returns the (Qpad/tq padded) ok-flag rows
    for fallback-rate diagnostics.

    aabb=True replaces the brute stage 1 with per-block AABB lower bounds
    (~100x fewer stage-1 ops; exactness preserved through the certificate
    plus a true-min fallback) — but the lb-based certificate is far
    weaker: on ABC surface clouds with grid queries the tile fallback
    rate was 56-100% (vs 0% with true minima), so the brute pass ends up
    running anyway. Kept (tested-exact) for experimentation on clouds
    where blocks separate better; default OFF.

    (A tau_hat group-culling stage-1 variant lived here through r4/r5: it
    never compiled at production size — Mosaic's register allocator
    spilled 183-191 MB of VMEM for the per-group survivor bookkeeping
    (SMEM flags + pl.when per group), both as 59 unrolled slices (r4) and
    after a dense-reduction rewrite (r5). Removed rather than shipped as
    dead surface. The cull *potential* is real — a host-side measurement
    of the same bound logic culls ~75% of block groups per tile at the
    production config (/tmp-archived in ROADMAP) — so a future attempt
    should restructure the brute pass around a compacted survivor list
    instead of per-group conditionals.)
    """
    n = points.shape[0]
    pad_n = (-n) % (8 * S)  # pad to 8-block groups for the stage-1 matmul
    npad = n + pad_n
    # tq is an UPPER BOUND: shrink until the kernel's modeled scoped-VMEM
    # footprint fits the cap (see clamp_tile) — callers cannot compile an
    # over-budget kernel
    tq = clamp_tile(k, n, tq, aabb_on=aabb)
    pts = jnp.pad(points, ((0, pad_n), (0, 0)))
    if valid is None:
        valid = jnp.ones((n,), bool)
    valid_p = jnp.pad(valid, (0, pad_n))
    w = jnp.where(valid_p, 0.0, jnp.sqrt(jnp.float32(PAD_PENALTY)))

    pts_cm = jnp.concatenate([pts.T, w[None, :]], axis=0)  # (4, Npad)
    nb = npad // S
    # transposed block-major hi/lo bf16 layouts (4*S, nb): row r =
    # coord-part r//S for in-block point r%S, column = block id
    pts_blk_t = pts_cm.reshape(4, nb, S).transpose(0, 2, 1).reshape(4 * S, nb)

    num_q = queries.shape[0]
    pad_q = (-num_q) % tq
    qp = jnp.pad(queries, ((0, pad_q), (0, 0)))

    kb_full = min(k, nb)
    kb1 = min(kb, kb_full) if kb > 0 else kb_full  # kb=0: band disabled
    # the AABB stage 1 produces lower bounds, which are only exact through
    # the banded certificate + fallback; the full-band path's exactness
    # argument needs true minima, so it keeps the brute stage 1
    aabb = aabb and kb1 < kb_full

    # per-block AABBs (6, nb) -> pre-broadcast (6*nb, tq) so the kernel's
    # stage-1 math is pure (nb, tq) elementwise ops with zero relayouts.
    # Fully-padded blocks get +/-BIG planes -> lb ~ BIG^2, never selected.
    # When the AABB stage is off, a tiny (8, tq) dummy replaces it — the
    # kernel never reads it, and a zeros (6*nb, tq) block wasted ~3-6 MB
    # of VMEM on the default path.
    if aabb:
        BIG = jnp.float32(1e15)
        pts_b = pts.reshape(nb, S, 3)
        validb = valid_p.reshape(nb, S, 1)
        lo = jnp.min(jnp.where(validb, pts_b, BIG), axis=1)  # (nb, 3)
        hi = jnp.max(jnp.where(validb, pts_b, -BIG), axis=1)
        planes = jnp.concatenate([lo.T, hi.T], axis=0)  # (6, nb)
        aabb_bc = jnp.broadcast_to(
            planes[:, :, None], (6, nb, tq)
        ).reshape(6 * nb, tq)
        aabb_rows = 6 * nb
    else:
        aabb_rows = 8
        aabb_bc = jnp.zeros((aabb_rows, tq), jnp.float32)

    grid = qp.shape[0] // tq
    out, okf = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, nb=nb, tq=tq, kb=kb1, aabb=aabb),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tq, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * S, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((aabb_rows, tq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, qp.shape[0]), jnp.int32),
            jax.ShapeDtypeStruct((8, qp.shape[0]), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, tq), jnp.float32),
            pltpu.VMEM((kb_full, tq), jnp.int32),
            pltpu.VMEM((kb_full * S, tq), jnp.float32),
        ],
        # the banded kernel's candidate slab and the full-cloud inputs
        # exceed XLA's default 16 MiB scoped-vmem cap; v5e has 128 MiB
        # physical VMEM, so raise the cap (clamp_tile budgets against it)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_CAP_BYTES
        ),
        interpret=interpret,
    )(qp, pts_cm, pts_blk_t, aabb_bc)
    if return_stats:
        return out.T[:num_q], okf
    return out.T[:num_q]

