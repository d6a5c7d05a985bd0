"""Worker for the 2-process multi-host CLI test (tests/test_multihost_cli.py).

Runs the REAL train.py CLI under the distributed runtime: argv[1] is the
virtual CPU device count for this process, the rest is passed to train.main
verbatim (including --coordinator_address/--num_processes/--process_id, the
multi-host flags under test). Also used for the single-process baseline run
(no distributed flags) so both measurements share one interpreter setup.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=" + sys.argv[1]
    # XLA:CPU's in-process collective rendezvous hard-aborts the process
    # (SIGABRT, rendezvous.cc "Termination timeout ... exceeded") if the
    # device-partition threads don't all arrive within 40 s — on a loaded
    # 1-core CI box the OS scheduler can starve a partition thread past
    # that. Raise it: slow is fine, dead is not. (VERDICT r4 #4)
    + " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train

    train.main(sys.argv[2:])
