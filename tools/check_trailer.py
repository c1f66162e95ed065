#!/usr/bin/env python3
"""Trailer honesty guard (VERDICT r8 item 8).

Asserts that the prose totals in COVERAGE.md and README.md match the
correctness artifacts, so green prose can never ship over red artifacts.

Usage:
  python3 tools/check_trailer.py                # audit latest CORRECTNESS_r{N}.json
  python3 tools/check_trailer.py --round 8      # audit a specific round
  python3 tools/check_trailer.py --local OUT    # audit a local Verify+compare run
                                                # (OUT/correctness_local.json, written
                                                # by tools/compare_oracle.py) against
                                                # the LATEST "Totals (round N)" block

Checks:
  1. COVERAGE.md's `**Totals (round N): X queries — Y DuckDB-oracle
     hash-checked, Z rows-only` block: X == total entries, Y == entries with
     rows+schema+hash all true, Z == X - Y.
  2. Every README.md claim of the form `(Y of X;` (the oracle-coverage
     convention): Y == oracle-pass count, X == total.
  3. Every README.md claim of the form `Y/X hash-match` (the Verifying
     paragraph): Y == oracle-pass count, X == total (r10 verdict item 5 —
     this claim drifted silently because only `(Y of X;` was guarded).
  4. Every README.md gate enumeration `q67/q88/.../qNNN gates` names
     exactly the artifact's must-be-empty gate set (keys ending `_gate`,
     plus q67_sketch_precision which predates the suffix convention),
     and every named gate is hash-match green in the artifact.
  5. No artifact entry has a recorded error; in --round mode, BENCH_r{N}
     parsed its JSON line, exited rc 0, and reported no per-query errors.

Exit 0 = prose and artifacts agree; exit 1 with a diff otherwise.
"""
import glob
import json
import re
import sys


def counts(correctness: dict):
    total = len(correctness)
    orc = sum(1 for v in correctness.values()
              if v.get("rows_match") and v.get("schema_match")
              and v.get("hash_match"))
    # 'no_oracle' is the driver's rows-only sentinel, not a failure
    errs = {k: v["err"] for k, v in correctness.items()
            if v.get("err") and v["err"] != "no_oracle"}
    return total, orc, errs


def main(argv):
    rnd = None
    local = None
    if "--round" in argv:
        rnd = int(argv[argv.index("--round") + 1])
    if "--local" in argv:
        local = argv[argv.index("--local") + 1]

    problems = []

    if local:
        path = f"{local.rstrip('/')}/correctness_local.json"
        correctness = json.load(open(path))
        src = path
    else:
        rounds = sorted(int(re.search(r"r(\d+)", p).group(1))
                        for p in glob.glob("CORRECTNESS_r*.json"))
        if rnd is None:
            rnd = rounds[-1]
        src = f"CORRECTNESS_r{rnd:02d}.json"
        correctness = json.load(open(src))
    total, orc, errs = counts(correctness)
    rows_only = total - orc
    print(f"artifact {src}: {total} queries, {orc} oracle-pass, "
          f"{rows_only} rows-only, {len(errs)} errors")
    if errs:
        problems.append(f"{src} records errors: {errs}")

    cov = open("COVERAGE.md").read()
    blocks = re.findall(
        r"\*\*Totals \(round (\d+)\): (\d+)(?:\+)? queries — (\d+) DuckDB-oracle\s+"
        r"hash-checked(?:[^,]*)?, (\d+)\s+rows-only", cov)
    if not blocks:
        problems.append("COVERAGE.md: no parsable 'Totals (round N)' block")
    else:
        want_round = max(int(b[0]) for b in blocks) if local else rnd
        match = [b for b in blocks if int(b[0]) == want_round]
        if not match:
            problems.append(
                f"COVERAGE.md: no Totals block for round {want_round}")
        else:
            _, x, y, z = (int(v) for v in match[0])
            if (x, y, z) != (total, orc, rows_only):
                problems.append(
                    f"COVERAGE.md Totals (round {want_round}) claims "
                    f"{x} queries / {y} oracle / {z} rows-only; artifacts say "
                    f"{total} / {orc} / {rows_only}")
            else:
                print(f"COVERAGE.md Totals (round {want_round}): OK")

    # README claims track the LATEST totals; when auditing an older
    # round's artifacts mid-round (prose already moved on), skip them.
    latest_block = max((int(b[0]) for b in blocks), default=0)
    if not local and rnd < latest_block:
        print(f"README.md: skipped (auditing round {rnd}, prose is at "
              f"round {latest_block})")
        readme = ""
    else:
        readme = open("README.md").read()
    of_claims = re.findall(r"\((\d+) of (\d+);", readme)
    if readme and not of_claims:
        problems.append(
            "README.md: no parsable '(Y of X;' claim found — a reworded "
            "claim escapes the guard; restore the convention")
    for y, x in of_claims:
        if (int(y), int(x)) != (orc, total):
            problems.append(
                f"README.md claims '({y} of {x};'; artifacts say "
                f"({orc} of {total})")
        else:
            print(f"README.md claim ({y} of {x}): OK")

    # Check 3: the Verifying paragraph's "Y/X hash-match" figure.
    hm_claims = re.findall(r"(\d+)/(\d+) hash-match", readme)
    if readme and not hm_claims:
        problems.append(
            "README.md: no parsable 'Y/X hash-match' claim found — a "
            "reworded claim escapes the guard; restore the convention")
    for y, x in hm_claims:
        if (int(y), int(x)) != (orc, total):
            problems.append(
                f"README.md claims '{y}/{x} hash-match'; artifacts say "
                f"{orc}/{total}")
        else:
            print(f"README.md claim {y}/{x} hash-match: OK")

    # Check 4: gate enumerations match the artifact's gate set. Gates are
    # the queries named `*_gate` (q116_gate_population is the population
    # AUDIT over the gates, not itself a must-be-empty gate) plus
    # q67_sketch_precision, which predates the `_gate` suffix convention.
    # Map qNN -> the exact artifact key, so the green check below audits
    # the gate row itself and can never first-match an unrelated key
    # sharing the qNN prefix (e.g. a future 'q88_recall' beside
    # 'q88_ann_gate').
    gates = {k.split("_")[0]: k for k in correctness
             if k.endswith("_gate")}
    if "q67_sketch_precision" in correctness:
        gates["q67"] = "q67_sketch_precision"
    gate_set = set(gates)
    enums = re.findall(r"((?:q\d+/){2,}q\d+)\s+gates", readme)
    if readme and not enums:
        problems.append(
            "README.md: no parsable 'qNN/.../qNN gates' enumeration "
            "found — a reworded gate list escapes the guard")
    for enum in enums:
        named = set(enum.split("/"))
        if named != gate_set:
            problems.append(
                f"README.md gate list {sorted(named)} != artifact gate "
                f"set {sorted(gate_set)}")
        else:
            print(f"README.md gate list ({len(named)} gates): OK")
    for g, key in sorted(gates.items()):
        row = correctness[key]
        if not (row.get("rows_match") and row.get("schema_match")
                and row.get("hash_match")):
            problems.append(f"gate {key} is not hash-match green in {src}")

    if not local:
        bpath = f"BENCH_r{rnd:02d}.json"
        try:
            bench = json.load(open(bpath))
            tail = bench.get("tail", "")
            if bench.get("rc", 0) != 0:
                problems.append(f"{bpath}: nonzero rc {bench['rc']}")
            # The driver's tail may be truncated mid-line, so parse
            # defensively: per-query timings by regex, errors by substring.
            m = re.search(r'"errors":\[([^\]]*)\]', tail)
            if m and m.group(1).strip():
                problems.append(f"{bpath}: bench errors [{m.group(1)}]")
            nq = len(re.findall(r'"q\d+[a-z0-9_]*":[0-9.]+', tail))
            print(f"{bpath}: rc {bench.get('rc', 0)}, {nq} query timings "
                  f"visible, errors {'[]' if not (m and m.group(1).strip()) else m.group(1)}")
        except FileNotFoundError:
            problems.append(f"{bpath} missing")

    if problems:
        print("\nTRAILER GUARD FAILED:")
        for p in problems:
            print(f"  - {p}")
        return 1
    print("\ntrailer guard: prose and artifacts agree")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
