"""Generic-path north-star bench (VERDICT r2 item 3): same pipeline and
convergence gates as bench.py, but the flow is the engine's GENERIC recipe
(arqs affine+RQS hybrid coupling, mixed masks, no funnel-specific mask
scheme) — the number a user gets on an unseen target, exercising the RQS
spline stack end-to-end (reverse-KL training + NUTS hot path).

This is a thin wrapper: it sets TPUFLOWS_BENCH_VARIANT=generic and runs
bench.py in-process, then mirrors the metric + detail lines into
docs/artifacts/bench_generic_tpu.json.

Usage: python scripts/bench_generic.py
"""
import io
import json
import os
import runpy
import sys
from contextlib import redirect_stderr, redirect_stdout

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    os.environ["TPUFLOWS_BENCH_VARIANT"] = "generic"
    out, err = io.StringIO(), io.StringIO()
    code = 0
    try:
        # replay the captured output in `finally`: if bench.py raises
        # anything other than SystemExit, the diagnostics must not be
        # swallowed with the redirect (ADVICE r3)
        try:
            with redirect_stdout(out), redirect_stderr(err):
                runpy.run_path(os.path.join(ROOT, "bench.py"),
                               run_name="__main__")
        except SystemExit as e:  # bench exits 1 if the gate fails
            code = int(e.code or 0)
    finally:
        sys.stdout.write(out.getvalue())
        sys.stderr.write(err.getvalue())
    if code == 0:
        lines = [ln for ln in (err.getvalue() + out.getvalue()).splitlines()
                 if ln.startswith("{")]
        # fresh runs land in *_latest.json — the curated multi-paragraph
        # header of the committed artifact is never clobbered (ADVICE r3);
        # promote a run by hand after reviewing it
        path = os.path.join(ROOT, "docs", "artifacts",
                            "bench_generic_tpu_latest.json")
        with open(path, "w") as f:
            f.write("# Generic-path north-star bench: arqs (affine+RQS) "
                    "flow, mixed masks, no target-specific structure.\n")
            for ln in lines:
                rec = json.loads(ln)
                if "metric" in rec or "variant" in rec or "window" in rec:
                    f.write(ln + "\n")
    sys.exit(code)


if __name__ == "__main__":
    main()
