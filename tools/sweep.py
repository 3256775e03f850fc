#!/usr/bin/env python3
"""Full-registry oracle sweep with a per-query timeout — the standing
per-round sf0.1 gate (round-9 verdict item 2).

Wraps tools/compare.py one query at a time in a subprocess so a
quadratic-closure oracle that runs for hours at sf0.1 becomes a bounded,
DOCUMENTED `timeout` row instead of a wedged sweep. Emits a JSON artifact
(default SWEEP_r10.json) with per-query status: ok / rows-only /
timeout / FAIL.

Usage: python3 tools/sweep.py <sfDir> <outDir> [artifact.json] [timeout_s]
(run a Verify dump into <outDir> first).
"""
import sys, os, json, subprocess, time

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    artifact = sys.argv[3] if len(sys.argv) > 3 else "SWEEP.json"
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 150
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    t0 = time.time()
    for n in names:
        start = time.time()
        # start_new_session puts compare.py AND any JVM it spawns into a
        # fresh process group; on timeout we killpg the whole group, so a
        # surviving Spark JVM can't contend with (and skew) later queries.
        p = subprocess.Popen(
            [sys.executable, os.path.join(here, "compare.py"),
             sf_dir, out_dir, n],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            start_new_session=True)
        try:
            out, _ = p.communicate(timeout=timeout)
            dt = round(time.time() - start, 1)
            if "[ok]" in out:
                results[n] = {"status": "ok", "sec": dt}
            elif "[rows-only]" in out:
                results[n] = {"status": "rows-only", "sec": dt}
            else:
                tail = [l for l in out.splitlines() if l.strip()][-1:]
                results[n] = {"status": "FAIL", "sec": dt,
                              "detail": tail[0] if tail else "?"}
        except subprocess.TimeoutExpired:
            import signal
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                pass
            p.communicate()
            results[n] = {"status": "timeout", "sec": timeout}
        print(f"{n}: {results[n]['status']} ({results[n]['sec']}s)", flush=True)
    counts = {}
    for r in results.values():
        counts[r["status"]] = counts.get(r["status"], 0) + 1
    summary = {"sf": sf_dir, "timeout_s": timeout,
               "total_sec": round(time.time() - t0, 1),
               "counts": counts, "queries": results}
    with open(artifact, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\n{counts} -> {artifact}")
    sys.exit(1 if counts.get("FAIL") else 0)

if __name__ == "__main__":
    main()
