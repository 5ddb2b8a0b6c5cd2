#!/usr/bin/env python
"""Multi-process/multi-host launcher — replaces mxnet tools/launch.py.

The reference launches ps-lite clusters over ssh/mpi with DMLC_* env
rendezvous (SURVEY.md §3.5). TPU-native there are no servers: every process
runs the same trainer and rendezvous through jax.distributed. This tool
just starts N processes (locally, or via an ssh hostfile) with the
RESNET_TPU_* env the trainer reads (parallel/dist.py).

Local smoke test (the mxnet 'launcher local' analog — SURVEY.md §4):
    python tools/launch.py -n 2 --local -- python train_resnet.py ...

Multi-host:
    python tools/launch.py -n 4 --hostfile hosts.txt \
        --coordinator host0:12345 -- python train_resnet.py ...
"""

from __future__ import annotations

import argparse
import os
import shlex
import signal
import subprocess
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-n", "--num-procs", type=int, required=True)
    p.add_argument("--coordinator", default="127.0.0.1:12355",
                   help="host:port of process 0")
    p.add_argument("--local", action="store_true",
                   help="all processes on this machine")
    p.add_argument("--hostfile", default=None,
                   help="one host per line (ssh launch)")
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="-- trainer command")
    args = p.parse_args(argv)
    cmd = args.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("missing trainer command after --")

    hosts = None
    if args.hostfile:
        hosts = [h.strip() for h in open(args.hostfile) if h.strip()]
        if len(hosts) < args.num_procs:
            p.error(f"hostfile has {len(hosts)} hosts, need {args.num_procs}")

    procs = []
    for rank in range(args.num_procs):
        env = dict(os.environ)
        env["RESNET_TPU_COORDINATOR"] = args.coordinator
        env["RESNET_TPU_NUM_PROCS"] = str(args.num_procs)
        env["RESNET_TPU_PROC_ID"] = str(rank)
        if args.local or hosts is None:
            procs.append(subprocess.Popen(cmd, env=env))
        else:
            env_str = " ".join(
                f"{k}={shlex.quote(env[k])}"
                for k in ("RESNET_TPU_COORDINATOR", "RESNET_TPU_NUM_PROCS",
                          "RESNET_TPU_PROC_ID"))
            remote = f"cd {shlex.quote(os.getcwd())} && {env_str} " \
                     + " ".join(shlex.quote(c) for c in cmd)
            procs.append(subprocess.Popen(["ssh", hosts[rank], remote]))

    def kill_all(signum=None, frame=None):
        for pr in procs:
            if pr.poll() is None:
                pr.terminate()

    signal.signal(signal.SIGINT, kill_all)
    signal.signal(signal.SIGTERM, kill_all)

    # Failure DETECTION (SURVEY.md §5): poll ALL workers — when any dies,
    # terminate the rest so the job fails fast instead of hanging in a
    # collective (the reference's dist_sync barrier hangs forever on a
    # dead worker; recovery is relaunch with --auto-resume, which picks up
    # the last collectively-written checkpoint). A worker blocked inside a
    # collective cannot run its Python SIGTERM handler, so terminate
    # escalates to SIGKILL after a grace period.
    import time
    rc = 0
    live = list(procs)
    killing_since = None
    while live:
        for pr in list(live):
            r = pr.poll()
            if r is None:
                continue
            live.remove(pr)
            rc = rc or r
            if r and live and killing_since is None:
                print(f"launch.py: worker exited rc={r}; "
                      "terminating remaining workers", file=sys.stderr)
                kill_all()
                killing_since = time.time()
        if killing_since is not None and live \
                and time.time() - killing_since > 10.0:
            for pr in live:
                if pr.poll() is None:
                    pr.kill()
        time.sleep(0.2)
    return rc


if __name__ == "__main__":
    sys.exit(main())
