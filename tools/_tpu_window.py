"""One-shot TPU measurement agenda: run everything the next tunnel window
should capture, in priority order, with flushed progress."""
import subprocess, sys, time, os

AGENDA = [
    ("fused",   "tools/_probe_fused.py",       1500),
    ("onedot",  "tools/_probe_onedot.py",      1500),
]

for name, script, to in AGENDA:
    print(f"=== [{name}] {script}", flush=True)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-"], stdin=open(script),
            capture_output=True, text=True, timeout=to,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for line in proc.stdout.splitlines():
            if line.startswith(("[", "{", "wrote")):
                print(f"  {line}", flush=True)
        if proc.returncode != 0:
            tail = "\n".join(proc.stderr.splitlines()[-6:])
            print(f"  rc={proc.returncode}\n{tail}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"  TIMEOUT after {to}s", flush=True)
    print(f"=== [{name}] done in {time.time()-t0:.0f}s", flush=True)
