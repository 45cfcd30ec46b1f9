"""Minimal system-wide kernel-stack sampler via perf_event_open + ctypes.

The sandbox has no perf/strace/bpftrace; this samples CPU clock on every CPU
with kernel callchains and symbolizes against /proc/kallsyms — enough to see
where system time goes. Root-only. Usage:

    python scripts/kstack_sampler.py <seconds> [top_n]
"""

from __future__ import annotations

import ctypes
import mmap
import os
import struct
import sys
import time
from collections import Counter

PERF_TYPE_SOFTWARE = 1
PERF_COUNT_SW_CPU_CLOCK = 0
PERF_SAMPLE_CALLCHAIN = 1 << 5
PERF_SAMPLE_TID = 1 << 1
PERF_RECORD_SAMPLE = 9
SYS_perf_event_open = 298  # x86_64

libc = ctypes.CDLL(None, use_errno=True)


class PerfEventAttr(ctypes.Structure):
    _fields_ = [
        ("type", ctypes.c_uint32),
        ("size", ctypes.c_uint32),
        ("config", ctypes.c_uint64),
        ("sample_freq", ctypes.c_uint64),
        ("sample_type", ctypes.c_uint64),
        ("read_format", ctypes.c_uint64),
        ("flags", ctypes.c_uint64),
        ("wakeup_events", ctypes.c_uint32),
        ("bp_type", ctypes.c_uint32),
        ("config1", ctypes.c_uint64),
        ("config2", ctypes.c_uint64),
        ("branch_sample_type", ctypes.c_uint64),
        ("sample_regs_user", ctypes.c_uint64),
        ("sample_stack_user", ctypes.c_uint32),
        ("clockid", ctypes.c_int32),
        ("sample_regs_intr", ctypes.c_uint64),
        ("aux_watermark", ctypes.c_uint32),
        ("sample_max_stack", ctypes.c_uint16),
        ("__reserved_2", ctypes.c_uint16),
        ("aux_sample_size", ctypes.c_uint32),
        ("__reserved_3", ctypes.c_uint32),
        ("sig_data", ctypes.c_uint64),
        ("config3", ctypes.c_uint64),
    ]


def open_cpu(cpu: int, freq: int = 499):
    attr = PerfEventAttr()
    attr.type = PERF_TYPE_SOFTWARE
    attr.size = ctypes.sizeof(PerfEventAttr)
    attr.config = PERF_COUNT_SW_CPU_CLOCK
    attr.sample_freq = freq
    attr.sample_type = PERF_SAMPLE_CALLCHAIN | PERF_SAMPLE_TID
    # freq=1 (bit 10), exclude_user (bit 4? no — flags bitfield below)
    # bitfield layout: disabled=1<<0, inherit=1<<1, pinned=1<<2, exclusive=1<<3,
    # exclude_user=1<<4, exclude_kernel=1<<5, exclude_hv=1<<6, exclude_idle=1<<7,
    # mmap=1<<8, comm=1<<9, freq=1<<10
    attr.flags = (1 << 10) | (1 << 7)  # freq mode, exclude_idle
    fd = libc.syscall(
        SYS_perf_event_open, ctypes.byref(attr), -1, cpu, -1, 0
    )
    if fd < 0:
        raise OSError(ctypes.get_errno(), os.strerror(ctypes.get_errno()))
    return fd


def load_kallsyms():
    syms = []
    with open("/proc/kallsyms") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 3 and parts[1] in ("T", "t"):
                try:
                    syms.append((int(parts[0], 16), parts[2]))
                except ValueError:
                    pass
    syms.sort()
    return syms


def symbolize(addr, syms):
    lo, hi = 0, len(syms)
    while lo < hi:
        mid = (lo + hi) // 2
        if syms[mid][0] <= addr:
            lo = mid + 1
        else:
            hi = mid
    return syms[lo - 1][1] if lo else hex(addr)


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    ncpu = os.cpu_count()
    fds, maps = [], []
    npages = 64
    for cpu in range(ncpu):
        fd = open_cpu(cpu)
        m = mmap.mmap(fd, (npages + 1) * 4096, mmap.MAP_SHARED, mmap.PROT_READ | mmap.PROT_WRITE)
        fds.append(fd)
        maps.append(m)
    time.sleep(seconds)
    for fd in fds:
        libc.ioctl(fd, 0x2401, 0)  # PERF_EVENT_IOC_DISABLE

    counter = Counter()
    leaf = Counter()
    pid_leaf = Counter()
    syms = load_kallsyms()
    size_mask = npages * 4096 - 1
    total = 0
    for m in maps:
        head = struct.unpack_from("Q", m, 0x400)[0]  # perf_event_mmap_page.data_head
        base = 4096
        off = 0
        while off < min(head, npages * 4096):
            pos = base + (off & size_mask)
            if pos + 8 > len(m):
                break
            etype, misc, esize = struct.unpack_from("IHH", m, pos)
            if esize == 0:
                break
            if etype == PERF_RECORD_SAMPLE and esize >= 24:
                pid, tid = struct.unpack_from("II", m, pos + 8)
                nr = struct.unpack_from("Q", m, pos + 16)[0]
                if nr < 256 and pos + 24 + nr * 8 <= len(m):
                    ips = struct.unpack_from(f"{nr}Q", m, pos + 24)
                    kern = [a for a in ips if a >= 0xFFFF000000000000]
                    if kern:
                        total += 1
                        names = [symbolize(a, syms) for a in kern[:6]]
                        leaf[names[1] if len(names) > 1 else names[0]] += 1
                        pid_leaf[(pid, names[1] if len(names) > 1 else names[0])] += 1
                        counter[";".join(reversed(names))] += 1
            off += esize
    print(f"kernel samples: {total} over {seconds}s on {ncpu} cpus")
    print("--- top leaf functions:")
    for name, c in leaf.most_common(top_n):
        print(f"{c:7d}  {name}")
    print("--- top pid/function:")
    import subprocess
    for (pid, name), c in pid_leaf.most_common(12):
        try:
            comm = open(f"/proc/{pid}/comm").read().strip()
            with open(f"/proc/{pid}/cmdline") as f:
                cl = f.read().replace("\0", " ")[:60]
        except OSError:
            comm, cl = "?", ""
        print(f"{c:7d}  pid={pid} {comm} {name}  [{cl}]")
    print("--- top stacks:")
    for stack, c in counter.most_common(10):
        print(f"{c:7d}  {stack}")


if __name__ == "__main__":
    main()
