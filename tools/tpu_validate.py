"""One-shot TPU validation + A/B after the tunnel outage.

Runs, in order (each stage prints its own timing):
  1. profile_kernels (validates capped-RMW walk, divmod finalize,
     expand tchunk, in-kernel membership on hardware; baseline numbers)
  2. encoder geometry A/B (FPNG_TPU_GUE=2048 FPNG_TPU_WLE=2560)
  3. deposit sub-tile A/B (FPNG_TPU_DEP_SUB=32)
  4. verify drive
Each A/B stage runs profile_kernels in a subprocess with the env knob.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ,
           JAX_COMPILATION_CACHE_DIR=os.path.join(HERE, ".jax_cache"))


def run(tag, extra_env=None, script="tools/profile_kernels.py",
        timeout=2400):
    env = dict(ENV)
    if extra_env:
        env.update(extra_env)
    print(f"===== {tag} =====", flush=True)
    r = subprocess.run([sys.executable, script], cwd=HERE, env=env,
                       capture_output=True, text=True, timeout=timeout)
    for ln in (r.stdout + r.stderr).splitlines():
        if "WARNING" not in ln and "cpu_aot" not in ln:
            print(ln, flush=True)
    if r.returncode != 0:
        print(f"[{tag} FAILED rc={r.returncode}]", flush=True)
    return r.returncode


def main():
    stages = [
        ("baseline", None, "tools/profile_kernels.py"),
        ("enc-g2048", {"FPNG_TPU_GUE": "2048", "FPNG_TPU_WLE": "2560"},
         "tools/profile_kernels.py"),
        ("dep-sub32", {"FPNG_TPU_DEP_SUB": "32"},
         "tools/profile_kernels.py"),
        ("verify", None, "tools/verify_drive.py"),
    ]
    only = sys.argv[1:] or None
    for tag, env, script in stages:
        if only and tag not in only:
            continue
        try:
            run(tag, env, script)
        except subprocess.TimeoutExpired:
            print(f"[{tag} TIMEOUT]", flush=True)


if __name__ == "__main__":
    main()
