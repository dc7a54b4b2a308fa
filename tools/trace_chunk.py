"""Capture a jax.profiler trace of the production chunk body on TPU.

Writes a trace to /tmp/chunktrace and prints the top ops by self time
parsed from the trace's .xplane.pb via the raw protobuf wire format (no
tensorflow/profiler deps in this env).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/trace_chunk.py
"""
from __future__ import annotations

import glob
import os
import struct
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


# --- minimal protobuf wire-format reader (tag/varint/length-delimited) ---
def _read_varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fnum, wtype = key >> 3, key & 7
        if wtype == 0:
            v, i = _read_varint(buf, i)
        elif wtype == 1:
            v = struct.unpack("<q", buf[i:i + 8])[0]
            i += 8
        elif wtype == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wtype == 5:
            v = struct.unpack("<i", buf[i:i + 4])[0]
            i += 4
        else:
            raise ValueError(f"wire type {wtype}")
        yield fnum, wtype, v


def parse_xplane(path):
    """Return list of (line_name, [(event_name, dur_ps, count)])."""
    data = open(path, "rb").read()
    # XSpace: repeated XPlane planes = 1
    out = []
    for fnum, _, v in _fields(data):
        if fnum != 1:
            continue
        plane = v
        name = ""
        metadata = {}
        lines = []
        for f2, _, v2 in _fields(plane):
            if f2 == 2:
                name = v2.decode()
            elif f2 == 3:  # lines
                lines.append(v2)
            elif f2 == 4:  # event_metadata map<int64, XEventMetadata>
                kid, kname = None, ""
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        kid = v3
                    elif f3 == 2:  # XEventMetadata
                        for f4, _, v4 in _fields(v3):
                            if f4 == 2:
                                kname = v4.decode()
                if kid is not None:
                    metadata[kid] = kname
        for ln in lines:
            lname = ""
            evs = {}
            for f3, _, v3 in _fields(ln):
                if f3 == 2:
                    lname = v3.decode()
                elif f3 == 8:  # events
                    mid, dur = None, 0
                    for f4, w4, v4 in _fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 3:  # duration_ps (varint)
                            dur = v4
                    if mid is not None:
                        nm = metadata.get(mid, str(mid))
                        d, c = evs.get(nm, (0, 0))
                        evs[nm] = (d + dur, c + 1)
            out.append((f"{name}/{lname}", sorted(
                ((n, d, c) for n, (d, c) in evs.items()),
                key=lambda t: -t[1])))
    return out


def main() -> int:
    from ppsurf_tpu.cli import load_checkpoint_variables
    from ppsurf_tpu.io import load_ply
    from ppsurf_tpu.ops.morton import morton_order
    from ppsurf_tpu.recon import field as field_mod
    from ppsurf_tpu.recon.field import FieldEvaluator, _make_chunk_body
    from ppsurf_tpu.train.model import ppsurf_spec

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    spec = ppsurf_spec(dtype=dtype)
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 50048

    pts = load_ply(
        "/root/reference/datasets/abc_minimal/04_pts_vis/"
        "00010009_d97409455fa543b3a224250f_trimesh_000.xyz.ply"
    ).vertices
    n = pts.shape[0]
    npz = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models_pretrained",
        "ppsurf_mini_infer.npz")
    variables = load_checkpoint_variables(npz)
    latents = np.random.RandomState(0).rand(
        n, spec.network_latent_size).astype(np.float32)
    net = spec.make_network()
    ev = FieldEvaluator(net, spec, variables, pts, latents, pts_raw=pts,
                        knn_tile=512)
    rng = np.random.RandomState(1)
    base = pts[rng.randint(0, n, c)]
    q = (base + 0.01 * rng.randn(c, 3)).astype(np.float32)
    q = q[morton_order(q, *ev._bbox)]
    qd = jnp.asarray(q)[None]

    body = _make_chunk_body(net, spec.is_ppsurf, spec.num_pts_local,
                            ev._spec_k, ev.shared_cloud, 512, None,
                            ev._projected, ev._fused)

    @jax.jit
    def body_full(v, pa, la, qa, ra, rv):
        return jnp.sum(body(v, pa, la, qa, ra, rv).astype(jnp.float32))

    args = (ev.variables, ev.pts, ev.latents, qd, ev.pts_raw, ev.raw_valid)
    np.asarray(body_full(*args))  # compile + settle

    tdir = "/tmp/chunktrace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        r = None
        for _ in range(10):
            r = body_full(*args)
        np.asarray(r)

    planes = []
    for p in glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True):
        planes.extend(parse_xplane(p))
    for lname, evs in planes:
        if not evs or "TPU" not in lname and "tpu" not in lname.lower():
            continue
        tot = sum(d for _, d, _ in evs)
        print(f"\n=== {lname}  total {tot / 1e12 * 1e3:.2f} ms "
              f"(over 10 reps) ===")
        for nm, d, cnt in evs[:25]:
            print(f"  {d / 1e12 * 1e3 / 10:9.3f} ms/rep x{cnt:4d}  {nm[:90]}")
    if not planes:
        print("no xplane data parsed; dirs:",
              os.listdir(tdir) if os.path.isdir(tdir) else "missing")
    return 0


if __name__ == "__main__":
    sys.exit(main())
