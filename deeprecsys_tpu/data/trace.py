"""Stack-distance trace profiling and synthetic trace generation.

Reference: ``data_generator/trace_profile.py`` (windowed stack-distance
profiling of an index trace into PDF/CDF files) and
``data_generator/trace_generator.py`` (LRU-stack synthetic trace replay
from a CDF). These model the temporal locality of production embedding-id
streams so synthetic load has realistic cache behavior.

The LRU stack model: maintain the unique lines in LRU order; for each new
reference draw a stack distance ``sd`` from the measured distribution;
``sd == 0`` introduces the next never-seen line, otherwise re-reference the
line at depth ``sd`` and move it to the top.
"""

from __future__ import annotations

import bisect

import numpy as np


def trace_profile(trace, enable_padding: bool = False):
    """Profile a 1-D index trace into (unique_lines, stack_distances).

    For each access, the stack distance is its depth in the LRU stack
    (0 = first-ever reference). Mirrors ``trace_profile.py:39-64``.
    """
    rstack: list[int] = []  # LRU stack, most recent at the end
    stack_distances: list[int] = []
    line_accesses: list[int] = []
    for x in trace:
        x = int(x)
        try:
            depth = len(rstack) - rstack.index(x)
            rstack.remove(x)
            stack_distances.append(depth)
        except ValueError:
            stack_distances.append(0)
            line_accesses.append(x)
        rstack.append(x)
    return line_accesses, stack_distances


def compute_distributions(stack_distances):
    """Turn raw stack distances into (support, pdf, cdf) arrays."""
    vals, counts = np.unique(np.asarray(stack_distances, dtype=np.int64), return_counts=True)
    pdf = counts / counts.sum()
    cdf = np.cumsum(pdf)
    cdf[-1] = 1.0
    return vals.tolist(), pdf.tolist(), cdf.tolist()


def write_dist_file(path, line_accesses, list_sd, cumm_sd):
    """Write the distribution file format the reference consumes
    (``read_dist_from_file``, dlrm_data_caffe2.py:355-367): three lines —
    unique line accesses, stack-distance support, stack-distance CDF."""
    with open(path, "w") as f:
        f.write(", ".join(str(int(x)) for x in line_accesses) + "\n")
        f.write(", ".join(str(int(x)) for x in list_sd) + "\n")
        f.write(", ".join(repr(float(x)) for x in cumm_sd) + "\n")


def read_dist_from_file(path):
    with open(path) as f:
        lines = f.readlines()
    line_accesses = [int(float(x)) for x in lines[0].strip().split(",")]
    list_sd = [int(float(x)) for x in lines[1].strip().split(",")]
    cumm_sd = [float(x) for x in lines[2].strip().split(",")]
    return line_accesses, list_sd, cumm_sd


def generate_stack_distance(cumm_val, cumm_dist, max_i, i, rng, enable_padding=False):
    """Sample one stack distance from the CDF (dlrm_data_caffe2.py:282-299).

    While fewer than ``max_i`` unique lines have been introduced, the
    support is shrunk so distances beyond the current stack depth cannot be
    drawn; with padding enabled, new references are disabled once all lines
    have been seen.
    """
    u = rng.random()
    if i < max_i:
        j = bisect.bisect(cumm_val, i) - 1
        fi = cumm_dist[j]
        u *= fi
    elif enable_padding:
        fi = cumm_dist[0]
        u = (1.0 - fi) * u + fi
    j = bisect.bisect_left(cumm_dist, u)
    return cumm_val[min(j, len(cumm_val) - 1)]


def trace_generate_lru(line_accesses, list_sd, cumm_sd, out_trace_len,
                       enable_padding=False, rng=None, i_start: int = 0,
                       return_i: bool = False):
    """Generate ``out_trace_len`` references via the LRU stack model
    (dlrm_data_caffe2.py:251-275). ``line_accesses`` is rotated in place,
    exactly as in the reference, so successive calls continue the stream.

    ``i_start``/``return_i`` carry the introduced-lines counter across
    calls: the reference generates the whole trace in ONE call
    (trace_generator.py:137), so a caller issuing many short calls must
    thread ``i`` through to sample the same distribution — the warm-up
    phase (distances clipped to the lines seen so far) happens once per
    STREAM, not once per call; resetting it re-biases every call toward
    small distances. The native ``NativeLruTrace`` persists it the same
    way.
    """
    if rng is None:
        rng = np.random.default_rng()
    max_sd = list_sd[-1]
    l = len(line_accesses)
    i = i_start
    ztrace = []
    for _ in range(out_trace_len):
        sd = generate_stack_distance(list_sd, cumm_sd, max_sd, i, rng, enable_padding)
        if sd == 0:  # introduce the next unseen line
            line_ref = line_accesses.pop(0)
            line_accesses.append(line_ref)
            i += 1
        else:  # re-reference the line at LRU depth sd
            pos = max(0, min(l - 1, l - sd))
            line_ref = line_accesses.pop(pos)
            line_accesses.append(line_ref)
        ztrace.append(int(line_ref))
    if return_i:
        return ztrace, i
    return ztrace


def synthesize_zipf_distribution(num_lines: int, alpha: float = 1.05, num_samples: int = 10000, seed: int = 0):
    """Create a plausible stack-distance distribution without production
    traces: profile a Zipf-distributed synthetic access stream. Stands in
    for the reference's shipped ``profile/sd_cumm`` example data."""
    rng = np.random.default_rng(seed)
    raw = rng.zipf(alpha, size=num_samples)
    trace = np.mod(raw, num_lines)
    line_accesses, sds = trace_profile(trace)
    vals, _pdf, cdf = compute_distributions(sds)
    return line_accesses, vals, cdf


def main(argv=None):
    """Offline CLI, the ``trace_profile.py`` / ``trace_generator.py``
    analog (reference usage: profile a real id trace into a distribution
    file, then synthesize arbitrarily long traces from it):

      python -m deeprecsys_tpu.data.trace profile \
          [--trace-file ids.txt | --zipf-lines 1000] --out dist.txt
      python -m deeprecsys_tpu.data.trace generate \
          --dist-file dist.txt --length 65536 --out trace.txt
    """
    import argparse

    ap = argparse.ArgumentParser(description="stack-distance trace tools")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("profile", help="index trace -> distribution file")
    p.add_argument("--trace-file", help="text file of whitespace/comma-separated ids")
    p.add_argument("--zipf-lines", type=int, default=0,
                   help="no trace file: profile a synthetic Zipf stream over N lines")
    p.add_argument("--zipf-alpha", type=float, default=1.05)
    p.add_argument("--samples", type=int, default=100_000)
    p.add_argument("--out", required=True)

    g = sub.add_parser("generate", help="distribution file -> synthetic trace")
    g.add_argument("--dist-file", required=True)
    g.add_argument("--length", type=int, required=True)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--out", required=True)

    args = ap.parse_args(argv)
    if args.cmd == "profile":
        if args.trace_file:
            text = open(args.trace_file).read().replace(",", " ")
            trace = np.asarray([int(x) for x in text.split()], dtype=np.int64)
            line_accesses, sds = trace_profile(trace)
            vals, _pdf, cdf = compute_distributions(sds)
        elif args.zipf_lines > 0:
            line_accesses, vals, cdf = synthesize_zipf_distribution(
                args.zipf_lines, args.zipf_alpha, args.samples)
        else:
            ap.error("need --trace-file or --zipf-lines")
        write_dist_file(args.out, line_accesses, vals, cdf)
        print(f"profiled {len(line_accesses)} unique lines, "
              f"{len(vals)} stack-distance bins -> {args.out}")
    else:
        line_accesses, list_sd, cumm_sd = read_dist_from_file(args.dist_file)
        trace = trace_generate_lru(line_accesses, list_sd, cumm_sd, args.length,
                                   rng=np.random.default_rng(args.seed))
        with open(args.out, "w") as f:
            f.write("\n".join(str(x) for x in trace) + "\n")
        print(f"generated {len(trace)} references over "
              f"{len(set(trace))} unique lines -> {args.out}")


if __name__ == "__main__":
    main()


class NativeLruTrace:
    """Stateful native LRU trace stream (C++ ``drs_trace_generate_lru``):
    ~100x the Python loop, deterministic via its own splitmix64 state.
    Semantically identical LRU-stack model; the random stream differs from
    the numpy path (each impl is reproducible under its seed)."""

    def __init__(self, line_accesses, list_sd, cumm_sd, seed: int = 0,
                 enable_padding: bool = False):
        import ctypes

        from deeprecsys_tpu.runtime.native import get_lib

        self._lib = get_lib()
        self._ct = ctypes
        self.lines = np.ascontiguousarray(line_accesses, dtype=np.int64)
        self.sd_vals = np.ascontiguousarray(list_sd, dtype=np.int64)
        self.sd_cdf = np.ascontiguousarray(cumm_sd, dtype=np.float64)
        self.head = np.zeros(1, dtype=np.int64)
        mix = (seed * 0x9E3779B97F4A7C15 + 0x632BE59BD9B4E019) % (1 << 64)
        self.state = np.array([mix], dtype=np.uint64)
        self.i = 0
        self.enable_padding = enable_padding

    def generate(self, out_len: int) -> np.ndarray:
        ct = self._ct
        out = np.empty(out_len, dtype=np.int64)
        self.i = self._lib.drs_trace_generate_lru(
            self.lines.ctypes.data_as(ct.c_void_p), len(self.lines),
            self.head.ctypes.data_as(ct.c_void_p),
            self.sd_vals.ctypes.data_as(ct.c_void_p),
            self.sd_cdf.ctypes.data_as(ct.c_void_p), len(self.sd_vals),
            out_len, out.ctypes.data_as(ct.c_void_p),
            self.state.ctypes.data_as(ct.c_void_p),
            int(self.enable_padding), self.i,
        )
        return out
