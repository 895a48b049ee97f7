"""Fixed CPU-bound spin: wall time of a deterministic workload = host-load probe."""
import sys, time
def spin():
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i * i
    return time.perf_counter() - t0
if __name__ == "__main__":
    print(round(spin(), 4))
