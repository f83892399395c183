"""Multi-process worker for tests/test_multihost.py.

Run as:  python tests/multihost_worker.py <port> <nproc> <pid> <ndev> <out>
         [mode]

Initializes jax.distributed on the CPU backend with `ndev` virtual devices
per process and drives the shared tiny problem on the GLOBAL ('rays',)
mesh. mode="step" (default): one mapping step, writes loss + per-leaf param
checksums. mode="slam": N frames of the tiny end-to-end SLAM loop
(track + selection + map + keyframe adds, sim.run_tiny_slam), writes the
trajectory. Process 0 writes JSON; the test compares against a
single-process run with the same total device count.
"""

import json
import os
import sys


def main():
    port, nproc, pid, ndev, out_path = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else "step"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={ndev}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")

    from unislam_tpu.parallel import distributed as dist

    my_pid = dist.initialize_from_env(coordinator=f"localhost:{port}",
                                      num_processes=int(nproc),
                                      process_id=int(pid))
    assert jax.device_count() == int(nproc) * int(ndev), \
        f"global devices {jax.device_count()}"

    from unislam_tpu.parallel import sim

    mesh = dist.global_ray_mesh()

    if mode == "slam":
        est7, losses = sim.run_tiny_slam(mesh=mesh, n_frames=6,
                                         multiprocess=True)
        if my_pid == 0:
            with open(out_path, "w") as f:
                json.dump({"est7": est7.tolist(), "losses": losses,
                           "n_global_devices": jax.device_count(),
                           "n_processes": jax.process_count()}, f)
        print(f"worker {my_pid} slam done", flush=True)
        return

    p = sim.build_tiny_mapping_problem(mesh=mesh)
    # every jit input must be a global array in multi-process mode
    rep = lambda t: dist.replicate(mesh, t)
    import jax.numpy as jnp
    key = jax.random.PRNGKey(3)
    opt_tree, opt_state, loss = p.step(
        rep(p.opt_tree), rep(p.opt_state), rep(p.bank), rep(p.depth),
        rep(p.color), rep(p.rays_d), rep(p.probs), rep(p.extra_probs),
        rep(p.pose_grad_mask), rep(key), rep(jnp.float32(1.0)))
    loss_val = float(dist.fetch_replicated(loss))

    if my_pid == 0:
        result = {"loss": loss_val,
                  "checksums": sim.param_checksums(opt_tree),
                  "n_global_devices": jax.device_count(),
                  "n_processes": jax.process_count()}
        with open(out_path, "w") as f:
            json.dump(result, f)
    print(f"worker {my_pid} done loss={loss_val}", flush=True)


if __name__ == "__main__":
    main()
