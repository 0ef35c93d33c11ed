"""Decompose the weighted-adaprox first-call cliff (VERDICT r4 #3).

``results_r4.json:fused_adaprox_weighted_flagship.note`` recorded a
543 s *first call* of the weighted XLA adaprox path at the flagship
shape (C=5, K=7, N=1e6) and attributed it to "first compile through the
remote tunnel". This script measures where that time actually goes, in
fresh subprocesses so in-process jit caches cannot leak between cases:

- ``cold``:   empty ``JAX_COMPILATION_CACHE_DIR`` -> true end-to-end
  first call including the remote XLA compile (the env compiles
  terminal-side via the axon tunnel's POST /remote_compile).
- ``warm``:   same on-disk cache the cold case just populated -> first
  call in a new process when the executable is already cached on disk
  (the shipped default, ``~/.cache/proxmin_tpu/xla`` enabled by
  ``proxmin_tpu/__init__.py``, behaves like this after any prior run).
- ``repeat``: second call in the same process (driver cache hit).

Each case also reports the sum of XLA compile seconds parsed from
``jax_log_compiles`` output, so "compile" is separated from tracing +
transfer + dispatch. The unweighted path and the fused Pallas engine
run as controls.

Findings land in docs/BENCHMARKS.md ("Compile behavior") and
``benchmarks/results_r5.json:compile_cliff``.

Run: ``python benchmarks/compile_cliff.py [--out FILE]``
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import sys, time
import numpy as np
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_log_compiles", True)
import jax.numpy as jnp
import proxmin_tpu as pt

weighted = {weighted!r}
engine = {engine!r}
C, K, N = 5, 7, 1_000_000
rng = np.random.default_rng(0)
Y = jnp.asarray(rng.random((C, N), dtype=np.float32))
A = jnp.asarray(rng.random((C, K)).astype(np.float32))
S = jnp.asarray(rng.random((K, N), dtype=np.float32))
W = (jnp.asarray((0.5 + rng.random((C, N))).astype(np.float32))
     if weighted else 1)
kw = dict(moment_dtype=jnp.bfloat16) if engine == "pallas" else {{}}

def call():
    t0 = time.perf_counter()
    pt.nmf.nmf(Y, A, S, W=W, prox_A=pt.operators.prox_plus,
               prox_S=pt.operators.prox_plus, algorithm="adaprox",
               engine=engine, max_iter=5, e_rel=0.0, **kw)
    return time.perf_counter() - t0

print(f"FIRST {{call():.2f}}", flush=True)
print(f"REPEAT {{call():.2f}}", flush=True)
"""

COMPILE_RE = re.compile(r"Finished XLA compilation of (\S+) in ([0-9.]+)")


def run_case(weighted, engine, cache_dir, timeout=900):
    env = dict(os.environ)
    if cache_dir is not None:
        env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    code = CHILD.format(repo=REPO, weighted=weighted, engine=engine)
    t0 = time.perf_counter()
    try:
        p = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired as e:
        return {"error": f"timeout {timeout}s",
                "tail": str(e.stderr)[-300:] if e.stderr else ""}
    out = p.stdout + p.stderr
    row = {"wall_s": round(time.perf_counter() - t0, 1)}
    m = re.search(r"FIRST ([0-9.]+)", out)
    if m:
        row["first_call_s"] = float(m.group(1))
    m = re.search(r"REPEAT ([0-9.]+)", out)
    if m:
        row["repeat_call_s"] = float(m.group(1))
    compiles = COMPILE_RE.findall(out)
    row["xla_compile_s"] = round(sum(float(s) for _, s in compiles), 2)
    row["n_compiles"] = len(compiles)
    if p.returncode != 0:
        row["error"] = out[-400:]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()

    results = {"shape": {"C": 5, "K": 7, "N": 1_000_000},
               "cases": {}}
    cold_dirs = {}
    for name, weighted, engine, cold in (
            ("weighted_xla_cold", True, "xla", True),
            ("weighted_xla_warm", True, "xla", False),
            ("unweighted_xla_cold", False, "xla", True),
            ("weighted_fused_bf16m_cold", True, "pallas", True),
    ):
        if cold:
            cache = tempfile.mkdtemp(prefix="coldxla_")
            cold_dirs[(weighted, engine)] = cache
        else:
            # warm = re-run against the cache the matching cold case
            # just populated (a fresh process, so no in-memory reuse)
            cache = cold_dirs.get((weighted, engine))
        row = run_case(weighted, engine, cache, timeout=args.timeout)
        results["cases"][name] = row
        print(f"{name}: {json.dumps(row)}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")
    else:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
