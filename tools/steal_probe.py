"""Probe hypervisor CPU steal under load.

Steal time only accrues while this VM's vCPUs are busy, so an idle box
always reads ~0% no matter how oversubscribed the host is.  This probe
spins N worker *processes* (threads would share the GIL and exercise
one vCPU) for a few seconds and reports the steal fraction and the
per-process spin throughput — the honest "is this box benchable right
now" check (measured r12: 10-37% steal turned a 200 s bench into
>1250 s while in-VM load was 0.03 and the process table was empty).

Usage: python tools/steal_probe.py [processes] [seconds]
"""
import multiprocessing as mp
import sys
import time


def snap():
    # (steal, demanded=non-idle+steal): the ratio reads "fraction of
    # the CPU we asked for that the host withheld", independent of how
    # many vCPUs the workload keeps busy
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)
    return steal, sum(vals) - idle


def spin(deadline: float, out, i: int):
    x = 0
    n = 0
    while time.perf_counter() < deadline:
        for _ in range(10000):
            x += 1
        n += 10000
    out[i] = n


def run(n_procs: int, seconds: float):
    out = mp.Array("q", n_procs)
    deadline = time.perf_counter() + seconds
    procs = [mp.Process(target=spin, args=(deadline, out, i))
             for i in range(n_procs)]
    s0 = snap()
    t0 = time.perf_counter()
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    dt = time.perf_counter() - t0
    s1 = snap()
    steal = 100.0 * (s1[0] - s0[0]) / max(s1[1] - s0[1], 1)
    rates = [out[i] / dt / 1e6 for i in range(n_procs)]
    return steal, rates


def mem_bw_gbps(mb: int = 256, reps: int = 4) -> float:
    """Single-core memory-copy bandwidth — catches host neighbours
    polluting the shared memory bus, which register-only spins miss."""
    import numpy as np
    a = np.ones(mb * 131072, dtype=np.float64)
    b = np.empty_like(a)
    np.copyto(b, a)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(b, a)
    dt = time.perf_counter() - t0
    return reps * a.nbytes / dt / 1e9


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0
    steal, rates = run(n, secs)
    lo, hi = min(rates), max(rates)
    bw = mem_bw_gbps()
    print(f"procs={n} secs={secs} steal_pct={steal:.1f} "
          f"spin_M/s per-proc min={lo:.1f} max={hi:.1f} "
          f"mem_GBps={bw:.1f}")
    if steal > 5.0:
        print("VERDICT: host is oversubscribed - do not bench now")
    elif steal > 2.0:
        print("VERDICT: mild steal - bench numbers will be noisy")
    else:
        print("VERDICT: clean")


if __name__ == "__main__":
    main()
