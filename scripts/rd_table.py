"""Assemble the README RD table from rd_runs/*/eval.json + JPEG anchor.

Usage: python scripts/rd_table.py [rd_runs_dir]
Prints a GitHub-markdown table (learned points sorted by bpp) and the
JPEG anchor line for the same held-out image.
"""

import glob
import json
import os
import subprocess
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "rd_runs"
    rows = []
    for p in sorted(glob.glob(os.path.join(root, "*", "eval.json"))):
        with open(p) as fd:
            r = json.load(fd)
        h = r.get("held_out", r)  # older runs stored held-out metrics flat
        variants = [("", h)]
        if "held_out_ema" in r:  # Polyak-averaged params, same run
            variants.append((" (EMA)", r["held_out_ema"]))
        for k, hh in enumerate(r.get("held_out_rates", [])):
            variants.append((f" (rate={k})", hh))  # gain-unit operating points
        for tag, hh in variants:
            rows.append({
                "run": os.path.basename(os.path.dirname(p)) + tag,
                "preset": r["preset"], "lmbda": r["lmbda"],
                "steps": r["steps"],
                "bpp_real": hh.get("bpp_real_bitstream", "—"),
                "bpp_est": hh["bpp_estimated"],
                "psnr": hh["psnr_255"], "msssim": hh["msssim"],
            })
    rows.sort(key=lambda r: r["bpp_est"])

    print("| run | preset | λ | steps | bpp (real bitstream) | bpp (est.) | PSNR | MS-SSIM |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['run']} | {r['preset']} | {r['lmbda']} | {r['steps']} "
            f"| {r['bpp_real']} | {r['bpp_est']} "
            f"| {r['psnr']} | {r['msssim']} |"
        )

    # jpeg_anchor imports jax for MS-SSIM; pin it to CPU so assembling the
    # table never contends with (or hangs on) the tunneled TPU chip.
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "jpeg_anchor.py")],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    if out.returncode == 0:
        j = json.loads(out.stdout)
        pts = ", ".join(
            f"{p['bpp']} bpp → {p['psnr_255']} dB" for p in j["jpeg"]
        )
        print(f"\nJPEG anchor ({j['image']}): {pts}")


if __name__ == "__main__":
    main()
