#!/usr/bin/env python
"""Build + run the SERIAL reference (stubs/: one-rank MPI, LAPACK-backed
SuperLU, Gustavson mkl_dcsrmultcsr) and record its TRUE iteration counts
into tests/goldens/reference_convergence.json (VERDICT r3 #2).

Each config runs in its own process (the reference frees imperfectly
across repeated setups in one process). bcsstk16 ships only as .mtx and
the reference's converter writes a .bin next to the input, so inputs are
staged into a writable /tmp/refdata first.

Usage: python tools/refbuild/run_goldens.py
"""
import json
import os
import re
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
OUT = os.path.join(REPO, "tests", "goldens", "reference_convergence.json")
CONFIGS = ["poisson3d_16", "poisson3d_24", "poisson3d_32", "poisson3d_48",
           "banded_3000_16", "bcsstk16", "sih4"]


def main():
    subprocess.run(["make", "-j2"], cwd=HERE, check=True,
                   capture_output=True)
    os.makedirs("/tmp/refdata", exist_ok=True)
    for f in ("bcsstk16.mtx", "SiH4.bin"):
        src = f"/root/reference/data/FloridaCollection/{f}"
        if os.path.exists(src) and not os.path.exists(f"/tmp/refdata/{f}"):
            shutil.copy(src, "/tmp/refdata/")

    out = {}
    for cfg in CONFIGS:
        p = subprocess.run([os.path.join(HERE, "build", "record_goldens"),
                            cfg], capture_output=True, text=True,
                           timeout=1800)
        text = p.stdout
        rec = {"returncode": p.returncode}
        for key, pat in (
                ("iters", r"stopped at iteration\s*=\s*(\d+)"),
                ("init_res", r"initial residual\s*=\s*([\d.eE+-]+)"),
                ("final_res", r"final absolute residual\s*=\s*([\d.eE+-]+)"),
                ("rel_res", r"relative residual\s*=\s*([\d.eE+-]+)"),
                ("setup_s", r"TIMING assemble=[\d.]+ setup=([\d.]+)"),
                ("solve_s", r"TIMING solve=([\d.]+)")):
            m = re.search(pat, text)
            if m:
                rec[key] = int(m.group(1)) if key == "iters" \
                    else float(m.group(1))
        rec["levels"] = [int(x) for x in
                         re.findall(r"matrix size\s*=\s*(\d+)", text)]
        out[cfg] = rec
        print(cfg, rec.get("iters"), rec.get("rel_res"), rec["levels"])

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    sys.exit(main())
