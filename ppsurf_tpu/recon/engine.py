"""Reconstruction engine: region-grown volume -> marching cubes -> refine.

Parity target: reference
`export_mesh_and_refine_vertices_region_growing_v3` + `_create_volume`
(`source/poco_utils.py:26-254`). TPU-first redesign:

- the frontier/dilation bookkeeping stays on the host but is fully
  vectorized (separable boolean-shift dilation instead of the reference's
  python loop over points, `poco_utils.py:181-196`);
- every network query goes through the static-shape jit `FieldEvaluator`
  (queries padded to `rec_batch_size`), so the device executes one cached
  program regardless of frontier size;
- vertex refinement is the reference's bisection (`poco_utils.py:111-168`)
  vectorized over all crossing vertices at once, fixed `refine_iter`
  iterations.
"""
from __future__ import annotations

import typing

import numpy as np

from ppsurf_tpu.io.ply import Mesh
from ppsurf_tpu.recon.marching_cubes import marching_cubes
from ppsurf_tpu.recon.mesh_ops import clean_simple, remove_small_connected_components


def dilate_mask(mask: np.ndarray, size: int) -> np.ndarray:
    """Binary dilation by a (2*size+1)^3 cube, separable along axes."""
    out = mask
    for axis in range(3):
        acc = out.copy()
        for s in range(1, size + 1):
            shifted = np.zeros_like(out)
            src = [slice(None)] * 3
            dst = [slice(None)] * 3
            src[axis] = slice(s, None)
            dst[axis] = slice(None, -s)
            shifted[tuple(dst)] = out[tuple(src)]
            acc |= shifted
            shifted = np.zeros_like(out)
            src[axis] = slice(None, -s)
            dst[axis] = slice(s, None)
            shifted[tuple(dst)] = out[tuple(src)]
            acc |= shifted
        out = acc
    return out


def create_volume_region_growing(
    eval_field: typing.Callable[[np.ndarray], np.ndarray],
    input_points: np.ndarray,
    resolution: int,
    padding: int = 1,
    dilation_size: int = 2,
    out_value: float = 1.0,
    progress: typing.Optional[typing.Callable[[str], None]] = None,
    use_native: bool = True,
    prefill_radius: int = 0,
    prefill_period: int = 2,
    prefill_start: int = 4,
    prefill_min_band: int = 4096,
) -> typing.Tuple[np.ndarray, float, float]:
    """Evaluate the field on near-surface voxels by region growing.

    Returns (volume (R+2p)^3 float64 with NaN where unevaluated, step,
    bmin_pad). Semantics follow reference `_create_volume`
    (`poco_utils.py:178-254`): seed at input-point voxels, dilate +-2,
    evaluate, grow across sign changes until the frontier is empty.

    prefill_radius > dilation_size enables SPECULATIVE PREFILL: from
    round `prefill_start` on (the early frontier hugs the seed crust and
    is huge — prefilling around it wastes millions of queries), every
    `prefill_period` rounds the band within +-prefill_radius of the
    current frontier is bulk-evaluated into a value cache, so the
    strictly sequential rounds (the frontier advances ~dilation_size
    voxels per round along the surface) mostly read cached values instead
    of dispatching small device batches. The grower's control flow and
    the voxels written into `volume` are IDENTICAL either way — the field
    is deterministic, so caching cannot change the result — only the
    batching of device work changes.

    Overshoot discipline (VERDICT r2): the next `prefill_period` rounds
    can only touch dilate(frontier, dilation_size * prefill_period), so
    radius beyond that is pure speculative waste — keep
    prefill_radius <= dilation_size * prefill_period; bands smaller than
    `prefill_min_band` are skipped (tail rounds are cheap to evaluate
    directly through the small chunk buckets, and the band would mostly
    overshoot past the shrinking frontier).
    """
    import os as _os
    import time as _time

    _tp = _time.perf_counter()
    _dbg = (
        (lambda msg: progress(f"  [t] {msg}"))
        if progress is not None and _os.environ.get("PPSURF_EVAL_DEBUG") == "1"
        else None
    )

    bmin = float(input_points.min())
    bmax = float(input_points.max())
    step = (bmax - bmin) / (resolution - 1)
    bmin_pad = bmin - padding * step

    shape = (resolution + 2 * padding,) * 3
    volume = np.full(shape, np.nan, dtype=np.float64)
    if _dbg:
        _dbg(f"volume alloc: {_time.perf_counter() - _tp:.2f}s")
        _tp = _time.perf_counter()

    pts_ids = ((input_points - bmin) / step).astype(np.int32) + padding
    pts_ids = np.unique(np.clip(pts_ids, 0, shape[0] - 1), axis=0)

    # per-round grid walks run in the native library when built (they cost
    # >1 s/round on a 259^3 grid in numpy); numpy fallback below
    from ppsurf_tpu import native

    rg = None
    if use_native and native.available():
        try:
            rg = native.RegionGrowState(volume, dilation_size)
        except RuntimeError:
            rg = None
    unseen = None if rg is not None else np.ones(shape, dtype=bool)
    if _dbg:
        _dbg(f"rg state: {_time.perf_counter() - _tp:.2f}s")
        _tp = _time.perf_counter()

    # speculative-prefill cache (see docstring)
    prefill = prefill_radius > dilation_size
    if prefill:
        cache_vals = np.zeros(shape, dtype=np.float32)
        cache_mask = np.zeros(shape, dtype=bool)
        pf_rg = (
            native.RegionGrowState(volume, prefill_radius)
            if rg is not None
            else None
        )

    def eval_coords(coords: np.ndarray) -> np.ndarray:
        """Field at voxel coords, via the prefill cache when enabled."""
        if not prefill:
            return eval_field(
                coords.astype(np.float32) * step + bmin_pad
            ).astype(np.float64)
        hit = cache_mask[coords[:, 0], coords[:, 1], coords[:, 2]]
        vals = np.empty(coords.shape[0], np.float64)
        vals[hit] = cache_vals[
            coords[hit, 0], coords[hit, 1], coords[hit, 2]
        ]
        miss = coords[~hit]
        if miss.shape[0]:
            import time as _t2

            _ta = _t2.perf_counter()
            mv = eval_field(miss.astype(np.float32) * step + bmin_pad)
            _tb = _t2.perf_counter()
            vals[~hit] = mv
            cache_vals[miss[:, 0], miss[:, 1], miss[:, 2]] = mv
            cache_mask[miss[:, 0], miss[:, 1], miss[:, 2]] = True
            if _dbg is not None:
                _dbg(
                    f"field: {_tb - _ta:.2f}s cache-scatter: "
                    f"{_t2.perf_counter() - _tb:.2f}s"
                )
        return vals

    rounds = 0
    if progress is not None:
        progress(f"grow seeds: {pts_ids.shape[0]} voxels")
    while pts_ids.shape[0] > 0:
        # evaluate voxels without a value yet in the +-dilation cube of the
        # frontier: the field is deterministic, so skipping re-evaluation is
        # exact (the reference recomputes, `poco_utils.py:207-232`)
        _td = _time.perf_counter()
        if rg is not None:
            coords = rg.dilate_unevaluated(pts_ids)
            if _dbg:
                _dbg(f"dilate: {_time.perf_counter() - _td:.2f}s")
        else:
            frontier = np.zeros(shape, dtype=bool)
            frontier[pts_ids[:, 0], pts_ids[:, 1], pts_ids[:, 2]] = True
            region = dilate_mask(frontier, dilation_size)
            region &= ~np.isfinite(volume)
            coords = np.argwhere(region).astype(np.int32)
        if coords.shape[0]:
            _te = _time.perf_counter()
            vals_r = eval_coords(coords)
            if _dbg:
                _dbg(f"eval_coords: {_time.perf_counter() - _te:.2f}s")
            _tw = _time.perf_counter()
            volume[coords[:, 0], coords[:, 1], coords[:, 2]] = vals_r
            if _dbg:
                _dbg(f"volume write: {_time.perf_counter() - _tw:.2f}s")
        rounds += 1
        if progress is not None:
            progress(f"region-grow round {rounds}: {coords.shape[0]} voxels")

        def maybe_prefill(frontier_next: np.ndarray) -> None:
            # bulk-evaluate the speculative band around the NEXT frontier
            # into the cache (volume is untouched: only the grower writes
            # it). Centering on the next frontier instead of the current
            # one targets exactly the voxels the coming `prefill_period`
            # rounds can reach — overshoot discipline, VERDICT r2.
            if not (
                prefill
                and rounds >= prefill_start
                and (rounds - prefill_start) % prefill_period == 0
                and frontier_next.shape[0]
            ):
                return
            if pf_rg is not None:
                band = pf_rg.dilate_unevaluated(frontier_next)
            else:
                fr = np.zeros(shape, dtype=bool)
                fr[
                    frontier_next[:, 0], frontier_next[:, 1],
                    frontier_next[:, 2],
                ] = True
                reg = dilate_mask(fr, prefill_radius)
                reg &= ~np.isfinite(volume)
                band = np.argwhere(reg).astype(np.int32)
            if band.shape[0]:
                fresh = band[
                    ~cache_mask[band[:, 0], band[:, 1], band[:, 2]]
                ]
                if fresh.shape[0] >= prefill_min_band:
                    fv = eval_field(
                        fresh.astype(np.float32) * step + bmin_pad
                    )
                    cache_vals[fresh[:, 0], fresh[:, 1], fresh[:, 2]] = fv
                    cache_mask[fresh[:, 0], fresh[:, 1], fresh[:, 2]] = True
                    if progress is not None:
                        progress(
                            f"  prefill band: {fresh.shape[0]} voxels"
                        )

        if rg is not None:
            _tf = _time.perf_counter()
            pts_ids = rg.next_frontier(pts_ids)
            if _dbg:
                _dbg(f"next_frontier: {_time.perf_counter() - _tf:.2f}s")
            maybe_prefill(pts_ids)
            continue

        unseen[pts_ids[:, 0], pts_ids[:, 1], pts_ids[:, 2]] = False

        vals = volume[pts_ids[:, 0], pts_ids[:, 1], pts_ids[:, 2]]
        seeds_nonpos = pts_ids[vals <= 0]
        seeds_nonneg = pts_ids[vals >= 0]

        grow_from_nonpos = np.zeros(shape, dtype=bool)
        grow_from_nonpos[
            seeds_nonpos[:, 0], seeds_nonpos[:, 1], seeds_nonpos[:, 2]
        ] = True
        grow_from_nonpos = dilate_mask(grow_from_nonpos, dilation_size)

        grow_from_nonneg = np.zeros(shape, dtype=bool)
        grow_from_nonneg[
            seeds_nonneg[:, 0], seeds_nonneg[:, 1], seeds_nonneg[:, 2]
        ] = True
        grow_from_nonneg = dilate_mask(grow_from_nonneg, dilation_size)

        with np.errstate(invalid="ignore"):
            new_mask = (grow_from_nonpos & (volume >= 0) & unseen) | (
                grow_from_nonneg & (volume <= 0) & unseen
            )
        pts_ids = np.argwhere(new_mask).astype(np.int32)
        maybe_prefill(pts_ids)

    # padded borders forced to out_value (`poco_utils.py:248-253`)
    if padding > 0:
        volume[:padding], volume[-padding:] = out_value, out_value
        volume[:, :padding], volume[:, -padding:] = out_value, out_value
        volume[:, :, :padding], volume[:, :, -padding:] = out_value, out_value
    return volume, step, bmin_pad


def refine_vertices(
    verts: np.ndarray,
    volume: np.ndarray,
    eval_field: typing.Callable[[np.ndarray], np.ndarray],
    step: float,
    bmin_pad: float,
    refine_iter: int = 10,
    progress: typing.Optional[typing.Callable[[str], None]] = None,
    refine_device: typing.Optional[typing.Callable] = None,
) -> np.ndarray:
    """Bisection refinement of marching-cubes vertices along grid edges.

    verts are in grid-index space; returns world-space vertices. Follows
    reference `poco_utils.py:111-168`.
    """
    dirs = verts - np.floor(verts)
    dirs = (dirs > 0).astype(verts.dtype)
    # vertices on grid edges have exactly one fractional coordinate
    on_edge = (dirs.sum(axis=1) > 0) & (dirs.sum(axis=1) < 2)

    v = verts[on_edge]
    d = dirs[on_edge]
    v1i = np.floor(v).astype(int)
    v2i = v1i + d.astype(int)
    preds1 = volume[v1i[:, 0], v1i[:, 1], v1i[:, 2]]
    preds2 = volume[v2i[:, 0], v2i[:, 1], v2i[:, 2]]

    finite = np.isfinite(preds1) & np.isfinite(preds2)
    v = v[finite]
    v1 = v1i[finite].astype(np.float64) * step + bmin_pad
    v2 = v2i[finite].astype(np.float64) * step + bmin_pad
    preds1 = preds1[finite]
    preds2 = preds2[finite]
    mask = on_edge.copy()
    mask[on_edge] = finite

    world = verts.astype(np.float64) * step + bmin_pad
    v = v * step + bmin_pad

    if refine_device is not None:
        # all refine_iter bisection rounds in one device program per chunk
        # (FieldEvaluator.refine_bisection); update rule identical to the
        # host loop below
        if progress is not None:
            progress(f"refine x{refine_iter} on device: {v.shape[0]} verts")
        world[mask] = refine_device(
            v.astype(np.float32), v1.astype(np.float32),
            v2.astype(np.float32), preds1.astype(np.float32),
            preds2.astype(np.float32), refine_iter,
        ).astype(np.float64)
        return world.astype(np.float32)

    for it in range(refine_iter):
        preds = eval_field(v.astype(np.float32)).astype(np.float64)
        if progress is not None:
            progress(f"refine iter {it}")

        m1 = (preds * preds1) > 0
        v1[m1] = v[m1]
        preds1[m1] = preds[m1]
        m2 = (preds * preds2) > 0
        v2[m2] = v[m2]
        preds2[m2] = preds[m2]
        v = 0.5 * (v1 + v2)

    world[mask] = v
    return world.astype(np.float32)


def reconstruct_mesh(
    eval_field: typing.Callable[[np.ndarray], np.ndarray],
    input_points: np.ndarray,
    resolution: int,
    padding: int = 1,
    mc_value: float = 0.0,
    refine_iter: int = 10,
    out_value: float = 1.0,
    dilation_size: int = 2,
    min_component_faces: int = 6,
    progress: typing.Optional[typing.Callable[[str], None]] = None,
    refine_device: typing.Optional[typing.Callable] = None,
    prefill_radius: int = 0,
) -> typing.Optional[Mesh]:
    """Full reconstruction (reference
    `export_mesh_and_refine_vertices_region_growing_v3`).

    refine_device: optional on-device bisection
    (FieldEvaluator.refine_bisection) — same results, no host loop.
    prefill_radius: speculative-prefill band for region growing (see
    create_volume_region_growing) — same results, fewer device batches.
    """
    volume, step, bmin_pad = create_volume_region_growing(
        eval_field, input_points, resolution, padding=padding,
        dilation_size=dilation_size, out_value=out_value, progress=progress,
        prefill_radius=prefill_radius,
    )

    import os as _os
    import time as _time

    _dbg = (
        (lambda msg: progress(f"  [t] {msg}"))
        if progress is not None and _os.environ.get("PPSURF_EVAL_DEBUG") == "1"
        else None
    )

    _t0 = _time.perf_counter()
    finite = volume[np.isfinite(volume)]
    if finite.size == 0 or not (finite.max() > mc_value > finite.min()):
        return None  # field never crosses the iso level (`poco_utils.py:92-93`)

    verts, faces = marching_cubes(volume, mc_value)
    if _dbg:
        _dbg(f"mc: {_time.perf_counter() - _t0:.2f}s")
        _t0 = _time.perf_counter()
    mesh = clean_simple(Mesh(vertices=verts, faces=faces))
    mesh = remove_small_connected_components(mesh, num_faces=min_component_faces)
    if _dbg:
        _dbg(f"clean: {_time.perf_counter() - _t0:.2f}s")
        _t0 = _time.perf_counter()
    if mesh.is_empty:
        return None

    if refine_iter > 0:
        world = refine_vertices(
            mesh.vertices.astype(np.float64), volume, eval_field, step, bmin_pad,
            refine_iter=refine_iter, progress=progress,
            refine_device=refine_device,
        )
    else:
        world = (mesh.vertices.astype(np.float64) * step + bmin_pad).astype(np.float32)
    if _dbg:
        _dbg(f"refine: {_time.perf_counter() - _t0:.2f}s")
        _t0 = _time.perf_counter()

    mesh = clean_simple(Mesh(vertices=world, faces=mesh.faces))
    mesh = remove_small_connected_components(mesh, num_faces=min_component_faces)
    if _dbg:
        _dbg(f"final clean: {_time.perf_counter() - _t0:.2f}s")
    return mesh
