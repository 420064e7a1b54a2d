#!/usr/bin/env python3
"""Per-query watchdog wrapper around tools/gate.py for the sf10 probe
gate (dev tool, r16). The 500k-doc corpus makes a handful of DuckDB
oracles materialize the token-list lateral (~70 GB — measured q102,
which filled the volume twice); the SPARK side runs all 112 queries
fine, so the wall is the ORACLE ENGINE at this scale, not the library.

Runs each query through gate.py individually; kills any query whose
DuckDB run exceeds TIME_LIMIT or drags free disk below DISK_FLOOR_GB,
and records it as ORACLE-ENGINE-BOUND instead of crashing the sweep.
"""
import os
import shutil
import signal
import subprocess
import sys
import time

OUT = "/tmp/verify_sf10"
SF = "/tmp/graft_sf10s"
LOG = "tools/r16/GATE_SF10_perq.log"
TIME_LIMIT = 9 * 60          # seconds per oracle
DISK_FLOOR_GB = 35           # kill before the volume fills
ENV = dict(os.environ, GRAFT_GATE_MEMLIMIT="95GB")


def free_gb(path="/"):
    return shutil.disk_usage(path).free / (1 << 30)


def run_one(q, log):
    p = subprocess.Popen([sys.executable, "tools/gate.py", OUT, SF, q],
                         stdout=log, stderr=subprocess.STDOUT, env=ENV,
                         start_new_session=True)
    t0 = time.time()
    while True:
        rc = p.poll()
        if rc is not None:
            return "ok" if rc == 0 else "mismatch", time.time() - t0
        el = time.time() - t0
        if el > TIME_LIMIT or free_gb() < DISK_FLOOR_GB:
            reason = "time" if el > TIME_LIMIT else "disk"
            os.killpg(p.pid, signal.SIGKILL)
            p.wait()
            return f"oracle-engine-bound({reason})", el
        time.sleep(5)


def main():
    queries = sys.argv[1:]
    with open(LOG, "a") as log:
        for q in queries:
            status, el = run_one(q, log)
            line = f"[runner] {q}: {status} ({el:.0f}s, free={free_gb():.0f}G)"
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()
            # reclaim any spill the killed engine left behind
            shutil.rmtree(".tmp", ignore_errors=True)


if __name__ == "__main__":
    main()
