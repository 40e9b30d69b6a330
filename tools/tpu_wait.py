"""Wait until the (exclusive, tunneled) TPU is claimable: retry a tiny
compile+fetch until it completes quickly. Run BEFORE any TPU job, especially
after a previous job was killed (stale claims take minutes to expire)."""
import subprocess, sys, time

PING = (
    "import jax, jax.numpy as jnp; "
    "print(float(jax.jit(lambda v: (v*3+1).sum())(jnp.ones((17,23)))))"
)

deadline = time.time() + float(sys.argv[1]) if len(sys.argv) > 1 else time.time() + 600
attempt = 0
while time.time() < deadline:
    attempt += 1
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-u", "-c", PING],
            capture_output=True, timeout=90, text=True,
        )
    except subprocess.TimeoutExpired:
        print(f"attempt {attempt}: timeout; retrying", flush=True)
        continue
    if p.returncode == 0 and "1564" in p.stdout:
        print(f"tpu ready (attempt {attempt}, {time.time()-t0:.1f}s)")
        sys.exit(0)
    print(f"attempt {attempt}: rc={p.returncode} ({time.time()-t0:.1f}s); retrying", flush=True)
    time.sleep(10)
print("tpu NOT ready before deadline")
sys.exit(1)
