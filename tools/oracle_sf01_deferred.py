#!/usr/bin/env python3
"""Per-query retry of ORACLE_SF01.json's deferred twins (r18 verdict #1).

The r17/r18 deferral was a blanket regex (sim_|vec_|graph_) calibrated
by the one-shot compare hanging — never by per-query measurement. This
tool measures each deferred twin INDIVIDUALLY in a killable subprocess:

  - pass within the timeout → moved from `deferred` to `results` with
    its measured oracle cost (the record gains a real verdict),
  - timeout → stays deferred, reason now carries the MEASURED cost
    ("oracle killed after Ns"), which is what the verdict asked for on
    the irreducible rest,
  - fail → recorded as a real failure (loud, not deferred).

Usage: python3 tools/oracle_sf01_deferred.py <sf_dir> <verify_out_dir>
          [timeout_sec] [artifact_path] [only_prefix]
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))


def _run_one(sf_dir, out_dir, name, q):
    import oracle_check
    rc = oracle_check.main(sf_dir, out_dir, only={name})
    q.put(rc)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    path = sys.argv[4] if len(sys.argv) > 4 else "ORACLE_SF01.json"
    prefix = sys.argv[5] if len(sys.argv) > 5 else ""
    art = json.load(open(path))
    todo = sorted(n for n in art.get("deferred", {}) if n.startswith(prefix))
    print(f"{len(todo)} deferred to retry (timeout {timeout}s each)")
    for name in todo:
        # the verify dump must exist for this query at this SF
        if not os.path.isdir(f"{out_dir}/{name}"):
            print(f"SKIP {name}: no verify dump in {out_dir}")
            continue
        q = mp.Queue()
        p = mp.Process(target=_run_one, args=(sf_dir, out_dir, name, q))
        t0 = time.time()
        p.start()
        p.join(timeout)
        dt = time.time() - t0
        if p.is_alive():
            p.terminate()
            p.join()
            art["deferred"][name] = (
                art["deferred"][name].split(" [measured:")[0]
                + f" [measured: oracle killed after {int(dt)}s at {sf_dir}]")
            print(f"TIMEOUT {name} ({int(dt)}s)")
        else:
            rc = q.get() if not q.empty() else 1
            art["results"][name] = {
                "pass": rc == 0, "sec": round(dt, 1),
                "note": "retried individually from the deferred list "
                        "(r19); cost is the one-query DuckDB compare"}
            if rc == 0:
                art["deferred"].pop(name, None)
                print(f"PASS {name} ({dt:.1f}s)")
            else:
                print(f"FAIL {name} ({dt:.1f}s)")
        art["n_pass"] = sum(1 for v in art["results"].values() if v["pass"])
        art["n_fail"] = sum(1 for v in art["results"].values()
                            if not v["pass"])
        art["recorded_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())
        with open(path, "w") as f:
            json.dump(art, f, indent=1, sort_keys=True)
    print(f"done: {art['n_pass']} pass, {art['n_fail']} fail, "
          f"{len(art['deferred'])} still deferred")


if __name__ == "__main__":
    main()
