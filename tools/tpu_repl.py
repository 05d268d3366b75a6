"""Long-lived TPU command server.

The axon relay only accepts fresh connections during short windows, but an
ESTABLISHED connection keeps working through the down phases (BASELINE.md
round 5).  This process connects once and then execs python snippets dropped
into .tpu_cmd/<name>.py, writing stdout+traceback to .tpu_cmd/<name>.out
(atomically via .tmp rename).  State persists in a shared namespace `G`
between snippets, so expensive setup (index build, compiles) happens once.

Usage:  python tools/tpu_repl.py   (run in background from /root/repo)
Stop:   drop a file containing `QUIT = True` (or kill the exact PID).
"""
import io
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CMD_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tpu_cmd")
os.makedirs(CMD_DIR, exist_ok=True)


def main():
    import jax

    devs = jax.devices()
    print(f"[tpu_repl] connected: {devs}", flush=True)
    G = {"jax": jax, "__name__": "__tpu_repl__"}
    done = set()
    # mark liveness for watchers
    with open(os.path.join(CMD_DIR, "ALIVE"), "w") as f:
        f.write(f"{os.getpid()} {devs}\n")
    while True:
        names = sorted(
            n for n in os.listdir(CMD_DIR)
            if n.endswith(".py") and n not in done
        )
        ran = False
        for n in names:
            path = os.path.join(CMD_DIR, n)
            out_path = path[:-3] + ".out"
            if os.path.exists(out_path):
                done.add(n)
                continue
            done.add(n)
            ran = True
            with open(path) as f:
                src = f.read()
            buf = io.StringIO()
            t0 = time.time()
            old = sys.stdout
            sys.stdout = buf
            try:
                exec(compile(src, n, "exec"), G)
                status = "ok"
            except SystemExit:
                status = "quit"
            except BaseException:
                traceback.print_exc(file=buf)
                status = "err"
            finally:
                sys.stdout = old
            dt = time.time() - t0
            tmp = out_path + ".tmp"
            with open(tmp, "w") as f:
                f.write(f"# status={status} dt={dt:.2f}s\n")
                f.write(buf.getvalue())
            os.replace(tmp, out_path)
            print(f"[tpu_repl] ran {n}: {status} in {dt:.1f}s", flush=True)
            if G.get("QUIT"):
                return
        if not ran:
            time.sleep(0.5)


if __name__ == "__main__":
    main()
