"""Pool multiple same-config cluster_scaling runs into one report.

The paired-per-round estimator is associative: each round yields one
independent paired sample regardless of which process run it came from,
so pooling runs of the SAME (n_files, topology, knobs) config just
concatenates the per-round samples and re-takes medians.  Overhead
floors take the min across runs (the floor is a constant that noise
only inflates).

Usage: python BENCH/pool_results.py out.json run1.json run2.json ...
       (also re-emits BENCH/BASELINE.md via cluster_scaling.emit_report)
"""

from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from cluster_scaling import emit_report  # noqa: E402


def main() -> None:
    out_path, in_paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in in_paths]
    base = runs[0]
    for r in runs[1:]:
        assert r["n_files"] == base["n_files"], "pool same-size runs only"
        assert r["levels_executors"] == base["levels_executors"]

    def cat(key):
        return [x for r in runs for x in r[key]]

    ratios = cat("paired_ratios")
    adj = cat("adjusted_paired_ratios")
    ceilings = cat("ceiling_samples")
    bw = cat("bandwidth_ceiling_samples")
    steals = cat("steal_fractions")
    f_lo = min(r["fixed_overhead_s"]["lo"] for r in runs)
    f_hi = min(r["fixed_overhead_s"]["hi"] for r in runs)
    n_lo, n_hi = base["levels_executors"]

    speedup = statistics.median(ratios)
    adj_speedup = statistics.median(adj)
    hw = statistics.median(ceilings)
    bwm = statistics.median(bw)
    med_steal = statistics.median(steals)
    quiet = [i for i in range(len(ratios)) if steals[i] <= med_steal]
    speedup_quiet = statistics.median([ratios[i] for i in quiet])
    hw_quiet = statistics.median([ceilings[i] for i in quiet])

    def pool_level(key):
        # per-phase medians over all trials of all runs
        all_trials = [t for r in runs for t in r[key]["all_trials"]]
        phases = {p: statistics.median(t[p] for t in all_trials)
                  for p in all_trials[0]}
        totals = [sum(t.values()) for t in all_trials]
        sec = statistics.median(totals)
        return {"seconds": sec,
                "files_per_s": base["n_files"] / sec,
                "bytes_per_s": base[key]["bytes_per_s"]
                * base[key]["seconds"] / sec,
                "phases": phases, "all_trials": all_trials}

    report = dict(base)
    report.update({
        "trials": len(ratios),
        "pooled_from": in_paths,
        f"exec{n_lo}": pool_level(f"exec{n_lo}"),
        f"exec{n_hi}": pool_level(f"exec{n_hi}"),
        "paired_ratios": ratios,
        "adjusted_paired_ratios": adj,
        "ceiling_samples": ceilings,
        "bandwidth_ceiling_samples": bw,
        "steal_fractions": steals,
        "speedup": speedup,
        "adjusted_speedup": adj_speedup,
        "fixed_overhead_s": {"lo": f_lo, "hi": f_hi},
        "hardware_ceiling_speedup": hw,
        "bandwidth_ceiling_speedup": bwm,
        "scaling_efficiency": speedup / 4,
        "adjusted_efficiency_raw": adj_speedup / 4,
        "efficiency_vs_hardware": speedup / hw,
        "adjusted_efficiency_vs_hardware": adj_speedup / hw,
        "efficiency_vs_bandwidth": speedup / bwm,
        "quiet_rounds": quiet,
        "speedup_quiet_half": speedup_quiet,
        "ceiling_quiet_half": hw_quiet,
        "efficiency_vs_hardware_quiet_half": speedup_quiet / hw_quiet,
    })
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    emit_report(report)
    print(json.dumps({k: report[k] for k in (
        "trials", "speedup", "adjusted_speedup", "hardware_ceiling_speedup",
        "efficiency_vs_hardware", "adjusted_efficiency_vs_hardware",
        "speedup_quiet_half", "efficiency_vs_hardware_quiet_half")}))


if __name__ == "__main__":
    main()
