#!/usr/bin/env python3
"""Round gate — mechanizes the end-of-round checklist that was previously
an unenforced convention (and round 11 proved why that matters: a
zero-work round sailed through with nothing but a LEAKCHECK bump).

Steps, each recorded in GATE.json and ALL required to pass:

 0. clean_tree / head / head_stable — the gate records the HEAD sha it
               tested, refuses a dirty src/tools tree, and fails if HEAD
               moves mid-run: a GATE.json stamp is only meaningful if the
               recorded sha IS the round's final source commit (round 13's
               last source commit landed after the stamp, uncovered).
 1. work     — at least one commit touching src/ or tools/ since the last
               driver round-artifact commit ("round N: ..."); catches a
               zero-work round.
 2. tests    — `sbt test` green.
 3. verify   — `graft.Verify` run TWICE into separate dirs;
               tools/check.py (DuckDB oracle compare) green on run A;
               tools/determinism.py green across A/B.
 4. bench    — `graft.Bench` run TWICE (the uncontended dual-run
               protocol); tools/bench_compare.py vs the previous round's
               committed bench snapshot within the [0.8, 1.1] median band.
               Skipped only with an explicit --skip-bench (recorded).

Usage:
  tools/gate.py [--sf-dir /root/testdata/sf0.01]
                [--bench-sf-dir /root/testdata/sf0.1]
                [--prev-bench bench_full_rN.json]
                [--skip-tests] [--skip-bench]

Exit 0 iff every executed step passed and none that the gate requires was
silently skipped (GATE.json shows any skip explicitly).
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, **kw):
    print(f"[gate] $ {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=REPO, **kw)


def step_work():
    log = subprocess.run(
        ["git", "log", "--oneline"], cwd=REPO,
        capture_output=True, text=True).stdout.splitlines()
    pat = r"\bround \d+: (verdict|advice)"
    base = None
    # The base is the MOST RECENT round-artifact commit, INCLUDING HEAD:
    # when the gate runs while HEAD is still the previous round's
    # "round N: verdict" commit (a zero-work round), base = HEAD gives an
    # empty diff and a correct FAIL. The old code skipped log[0]
    # unconditionally, so that case found round N-1 as base and counted
    # round N's commits as fresh work — a false PASS on exactly the
    # zero-work case this step exists to catch.
    for line in log:
        if re.search(pat, line):
            base = line.split()[0]
            break
    if base is None:
        return True, "no prior round-artifact commit found (first round)"
    diff = subprocess.run(
        ["git", "log", "--oneline", f"{base}..HEAD", "--", "src", "tools"],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    n = len(diff.splitlines()) if diff else 0
    return n > 0, f"{n} code commit(s) since {base}"


def step_tests():
    r = sh(["sbt", "-batch", "test"], capture_output=True, text=True)
    tail = "\n".join((r.stdout or "").splitlines()[-15:])
    ok = r.returncode == 0 and "All tests passed." in (r.stdout or "")
    return ok, tail.splitlines()[-3:] if ok else tail


def step_verify(sf_dir):
    outs = []
    for tag in ("a", "b"):
        out = os.path.join(tempfile.gettempdir(), f"gate_verify_{tag}")
        r = sh(["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out}"],
               capture_output=True, text=True)
        fails = [l for l in (r.stdout or "").splitlines() +
                 (r.stderr or "").splitlines() if "[verify]" in l]
        if r.returncode != 0 or fails:
            return False, {"run": tag, "failures": fails[:20]}
        outs.append(out)
    chk = sh([sys.executable, "tools/check.py", sf_dir, outs[0]],
             capture_output=True, text=True)
    if chk.returncode != 0:
        return False, {"check": (chk.stdout or "").splitlines()[-20:]}
    det = sh([sys.executable, "tools/determinism.py", outs[0], outs[1]],
             capture_output=True, text=True)
    if det.returncode != 0:
        return False, {"determinism": (det.stdout or "").splitlines()[-20:]}
    return True, {"check": (chk.stdout or "").strip().splitlines()[-1],
                  "determinism": (det.stdout or "").strip().splitlines()[-1]}


def step_bench(bench_sf_dir, prev):
    lines = []
    for tag in ("a", "b"):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=bench_sf_dir,
                   SPARK_GRAFT_CPUS="32")
        r = sh(["sbt", "-batch", "runMain graft.Bench"],
               capture_output=True, text=True, env=env)
        metric = [l for l in (r.stdout or "").splitlines() if '"metric"' in l]
        if r.returncode != 0 or not metric:
            return False, {"run": tag, "tail": (r.stdout or "").splitlines()[-10:]}
        path = os.path.join(tempfile.gettempdir(), f"gate_bench_{tag}.json")
        with open(path, "w") as f:
            f.write(metric[-1])
        lines.append(path)
    if not prev or not os.path.exists(prev):
        return True, {"note": f"no previous bench snapshot ({prev}); runs recorded",
                      "runs": lines}
    cmp_ = sh([sys.executable, "tools/bench_compare.py", prev] + lines,
              capture_output=True, text=True)
    return cmp_.returncode == 0, {
        "compare": (cmp_.stdout or "").strip().splitlines(), "runs": lines}


def latest_bench_snapshot():
    snaps = [f for f in os.listdir(REPO)
             if re.fullmatch(r"bench_full_r\d+b?\.json", f)]
    if not snaps:
        return None
    snaps.sort(key=lambda f: (int(re.search(r"\d+", f).group()), f))
    return os.path.join(REPO, snaps[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--bench-sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--prev-bench", default=None)
    ap.add_argument("--skip-tests", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    gate = {"steps": {}, "pass": True}

    def record(name, ok, detail):
        gate["steps"][name] = {"pass": bool(ok), "detail": detail}
        gate["pass"] = gate["pass"] and bool(ok)
        print(f"[gate] {name}: {'PASS' if ok else 'FAIL'}", flush=True)

    def head_sha():
        return subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()

    # The stamp is only meaningful if it names the exact tree it tested
    # (r13's last source commit landed AFTER the gate stamp and was never
    # covered): record the HEAD sha, refuse a dirty src/tools tree (the
    # gate would be testing uncommitted code the sha doesn't name), and
    # fail if HEAD moves while the gate runs. Round close = this sha must
    # be the round's final source commit, checkable from GATE.json alone.
    gate["head"] = head_sha()
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--", "src", "tools"],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    record("clean_tree", not dirty,
           dirty.splitlines()[:10] if dirty else f"src/ and tools/ committed at {gate['head'][:12]}")

    ok, d = step_work()
    record("work", ok, d)

    if args.skip_tests:
        gate["steps"]["tests"] = {"pass": None, "detail": "SKIPPED by flag"}
    else:
        ok, d = step_tests()
        record("tests", ok, d)

    ok, d = step_verify(args.sf_dir)
    record("verify", ok, d)

    if args.skip_bench:
        gate["steps"]["bench"] = {"pass": None, "detail": "SKIPPED by flag"}
    else:
        prev = args.prev_bench or latest_bench_snapshot()
        ok, d = step_bench(args.bench_sf_dir, prev)
        record("bench", ok, d)

    final = head_sha()
    record("head_stable", final == gate["head"],
           f"HEAD {gate['head'][:12]} -> {final[:12]}"
           if final != gate["head"] else f"HEAD {gate['head'][:12]} unchanged")

    with open(os.path.join(REPO, "GATE.json"), "w") as f:
        json.dump(gate, f, indent=2, default=str)
    print(f"[gate] overall: {'PASS' if gate['pass'] else 'FAIL'} -> GATE.json")
    sys.exit(0 if gate["pass"] else 1)


if __name__ == "__main__":
    main()
