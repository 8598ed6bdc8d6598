"""VERDICT-r4 #9: equal-step train-set RD probe table.

Compares net_unet_ha_hs_dec vs source_net at matched λ/steps/seed on the
TRAIN-SET rows of their eval.json (train-set RD removes the held-out
generalization term: if the flagship still trails source_net ON the data
it was fit to, the gap is architecture cost of the _dec re-synthesis, not
data starvation).

Usage: python scripts/equalstep_table.py [dirA dirB ...]
       (default: rd_runs/v2_flagship_0.0067_r5 rd_runs/v2_src_0.0067_r5probe
        rd_runs/v2_src_0.0067_20k_base)
CPU-safe (reads json only).
"""

import json
import sys


def row(d):
    try:
        e = json.load(open(f"{d}/eval.json"))
    except FileNotFoundError:
        return None
    tr = e.get("train_set", [])
    if not tr:
        return None
    bpp = sum(t.get("bpp_estimated", 0.0) for t in tr) / len(tr)
    ps = sum(t.get("psnr_255", 0.0) for t in tr) / len(tr)
    ho = e.get("held_out", {})
    return {
        "dir": d,
        "preset": e.get("preset"),
        "steps": e.get("steps"),
        "lmbda": e.get("lmbda"),
        "n_train_rows": len(tr),
        "train_bpp": round(bpp, 4),
        "train_psnr": round(ps, 3),
        "held_bpp": round(ho.get("bpp_estimated", float("nan")), 4),
        "held_psnr": round(ho.get("psnr_255", float("nan")), 3),
    }


def main():
    dirs = sys.argv[1:] or [
        "rd_runs/v2_flagship_0.0067_r5",
        "rd_runs/v2_src_0.0067_r5probe",
        "rd_runs/v2_src_0.0067_20k_base",
    ]
    rows = [r for r in map(row, dirs) if r]
    if not rows:
        print("no eval.json rows found")
        return
    hdr = ["preset", "steps", "lmbda", "train_bpp", "train_psnr", "held_bpp", "held_psnr"]
    print(" | ".join(hdr))
    for r in rows:
        print(" | ".join(str(r[k]) for k in hdr), f"  ({r['dir']}, {r['n_train_rows']} rows)")


if __name__ == "__main__":
    main()
