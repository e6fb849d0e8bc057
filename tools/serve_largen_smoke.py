#!/usr/bin/env python3
"""VERDICT r4 #7: exercise the ACTUAL serve CLI at large N on chip.

Generates a synthetic 65536-row training CSV + 256 query points, runs

    python -m nonstationary_precip_tpu serve --model gibbs_exact \
        --matrixfree true [--chunked true] ...

as a REAL subprocess (the CLI path, not an in-process shortcut), and
records wallclock + the convergence evidence the CLI prints into
tools/serve_largen_smoke.json.  Run alone on the TPU (never share the
chip): `make serve-largen-smoke`.

Usage: python tools/serve_largen_smoke.py [n] [max_iters] [--chunked]
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "tools" / "serve_largen_smoke.json"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    chunked = "--chunked" in sys.argv
    rng = np.random.default_rng(7)
    x = rng.uniform(-3, 3, size=(n, 2)).astype(np.float32)
    y = (np.sin(2 * x[:, 0]) * np.cos(x[:, 1])
         + 0.1 * rng.normal(size=n)).astype(np.float32)
    train = Path("/tmp/serve_largen_train.csv")
    hdr = "lon,lat,precip"
    np.savetxt(train, np.column_stack([x, y]), delimiter=",",
               header=hdr, comments="")
    xq = rng.uniform(-3, 3, size=(256, 2)).astype(np.float32)
    pts = Path("/tmp/serve_largen_points.csv")
    np.savetxt(pts, xq, delimiter=",", header="lon,lat", comments="")
    out_csv = Path("/tmp/serve_largen_preds.csv")

    cmd = [
        sys.executable, "-m", "nonstationary_precip_tpu", "serve",
        "--model", "gibbs_exact", "--matrixfree", "true",
        "--train_csv", str(train), "--points_csv", str(pts),
        "--output", str(out_csv), "--max_iters", str(iters),
        "--precond_rank", "150",
    ]
    if chunked:
        cmd += ["--chunked", "true", "--chunk_iters", "8",
                "--n_chunks", "4"]
    print(" ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd=str(REPO), timeout=7200)
    wall = time.time() - t0
    log = proc.stdout + proc.stderr
    print(log[-3000:], flush=True)
    ok = proc.returncode == 0 and out_csv.exists()
    preds = None
    if out_csv.exists():
        preds = np.loadtxt(out_csv, delimiter=",", skiprows=1)
    # scrape the CLI's own evidence lines
    m_fit = re.search(r"fitted gibbs_exact in ([0-9.]+)s", log)
    m_cfit = re.search(r"chunked fit: .*worst relres ([0-9.e+-]+)", log)
    m_state = re.search(r"alpha solve relres=([0-9.e+-]+)", log)
    m_var = re.search(r"worst relres=([0-9.e+-]+)", log)
    m_served = re.search(r"served (\d+) points in ([0-9.]+)s", log)
    row = {
        "n": n, "max_iters": iters, "chunked": chunked,
        "wall_s": round(wall, 1),
        "returncode": proc.returncode,
        "fit_s": float(m_fit.group(1)) if m_fit else None,
        "serve_s": float(m_served.group(2)) if m_served else None,
        "served_points": int(m_served.group(1)) if m_served else None,
        "alpha_relres": float(m_state.group(1)) if m_state else None,
        "variance_relres_worst": float(m_var.group(1)) if m_var else None,
        "chunked_fit_relres": float(m_cfit.group(1)) if m_cfit else None,
        "output_finite": bool(preds is not None and np.isfinite(preds).all()),
        "output_rows": int(preds.shape[0]) if preds is not None else 0,
        "pred_std_positive": bool(
            preds is not None and (preds[:, 3] > 0).all()
        ),
        "ok": bool(ok),
        "cmd": " ".join(cmd),
        "date": time.strftime("%Y-%m-%d %H:%M"),
    }
    key = f"serve-largen-{'chunked-' if chunked else ''}{n}"
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[key] = row
    OUT.write_text(json.dumps(data, indent=2))
    print(json.dumps(row), flush=True)
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
