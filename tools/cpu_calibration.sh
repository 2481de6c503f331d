#!/usr/bin/env bash
# Hardware scaling-ceiling calibration for the N-vs-4N evidence
# (BENCH/BASELINE.md): a pure-CPU integer burn — no JVM, no allocation, no
# memory traffic — run as 8 pinned processes vs 32. Any 8→32 speedup deficit
# measured here is the BOX (virtualization steal, frequency scaling with
# active-core count), not the engine: a real N-node vs 4N-node cluster runs
# identical node shapes at both sizes and does not pay it.
#
# Usage: bash tools/cpu_calibration.sh   # prints work units/4s at 8 and 32
run() {
  local n=$1
  taskset -c 0-$((n-1)) python3 - <<PY
import multiprocessing as mp, time
def burn(_):
    x=1; c=0; t0=time.time()
    while time.time()-t0 < 4:
        for _ in range(100000): x=(x*1103515245+12345)&0xffffffff
        c+=1
    return c
if __name__ == '__main__':
    with mp.Pool($n) as p:
        r = p.map(burn, range($n))
    print("$n cores:", sum(r))
PY
}
run 8
run 32
