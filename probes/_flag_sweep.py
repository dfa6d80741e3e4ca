"""XLA:TPU tuning-option sweep over the 4-step headline denoise (VERDICT r4 #1a).

XLA_FLAGS is a dead end here: the LOCAL client (CPU xla + axon plugin) parses
it and aborts on TPU-backend flags, and compiles run REMOTELY anyway. Instead
each config is a `compiler_options` dict injected into every jax.jit of a
fresh `_ab_denoise.py` subprocess (env MD_COMPILER_OPTIONS) — these ride the
ExecutableBuildOptions env_option_overrides to the remote TPU compiler.
Unknown options come back as compile errors and are recorded as such.

Parses DENOISE_SECONDS; writes a ranked table to probes/flag_sweep_results.json.

Usage: python probes/_flag_sweep.py [config_name ...]  (default: all)
"""
import json
import os
import subprocess
import sys

BASE_ENV = dict(os.environ)

CONFIGS = {
    "baseline": {},
    # scoped VMEM: more VMEM per fusion lets bigger tiles / deeper pipelines
    # (the repo raised it once already for the flash kernel — but never swept
    # the whole-program value)
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # latency-hiding scheduler knobs
    "lhs_rerun": {"xla_latency_hiding_scheduler_rerun": "2"},
    # fusion shape / cost model
    "aggressive_fusion_layout": {
        "xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    "exp_fusion_cost": {
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true"},
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    "nested_loop_fusion": {
        "xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    # memory-bound loop optimizer
    "mblo": {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:true"},
    # dot/conv handling
    "no_dot_strength_red": {"xla_tpu_enable_dot_strength_reduction": "false"},
    "dot_dot_fusion_off": {"xla_tpu_dot_dot_fusion": "false"},
    "licm_inflate_2": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    # vector memory fusion windows
    "vector_fusion_windows": {
        "xla_tpu_vector_load_fusion_window": "2048",
        "xla_tpu_vector_store_fusion_window": "512"},
    # combos of individual winners get added by hand after a pass
}


def run_one(name: str, opts: dict) -> dict:
    env = dict(BASE_ENV)
    # probes/ is not the repo root; PREPEND (keep /root/.axon_site, which
    # carries the axon TPU plugin)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    if opts:
        env["MD_COMPILER_OPTIONS"] = json.dumps(opts)
    # option changes alter compiled code: keep the persistent cache but give
    # each config its own namespace so a config can't serve a stale executable
    env["JAX_COMPILATION_CACHE_DIR"] = f"/root/repo/.jax_cache_flags/{name}"
    try:
        p = subprocess.run(
            [sys.executable, "probes/_ab_denoise.py", "on"],
            env=env, cwd="/root/repo", capture_output=True, text=True,
            timeout=3600,
        )
    except subprocess.TimeoutExpired:
        return {"name": name, "opts": opts, "error": "timeout"}
    line = [l for l in p.stdout.splitlines() if l.startswith("DENOISE_SECONDS")]
    if p.returncode != 0 or not line:
        tail = (p.stderr or p.stdout).strip().splitlines()[-8:]
        return {"name": name, "opts": opts, "error": "\n".join(tail)}
    parts = line[-1].split()
    return {"name": name, "opts": opts, "best_s": float(parts[2]),
            "median_s": float(parts[4])}


def main():
    wanted = sys.argv[1:] or list(CONFIGS)
    results = []
    for name in wanted:
        print(f"=== {name}: {CONFIGS[name] or '(no flags)'}", flush=True)
        r = run_one(name, CONFIGS[name])
        print(json.dumps(r), flush=True)
        results.append(r)
        with open("/root/repo/probes/flag_sweep_results.json", "w") as f:
            json.dump(results, f, indent=1)
    ok = [r for r in results if "best_s" in r]
    ok.sort(key=lambda r: r["best_s"])
    print("\n=== ranked ===")
    for r in ok:
        print(f"{r['best_s']:7.3f}  {r['name']}")


if __name__ == "__main__":
    main()
