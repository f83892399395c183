"""Multi-device rays/s scaling sweep (BASELINE.md's 1-chip / 1-host / N-host
measurement).

Runs the REAL jitted mapping step (forward + backward + Adam, ray batch
sharded over a 1-D 'rays' mesh, scene grads all-reduced by XLA) at 1..N
devices and prints rays/s per mesh size.

On a machine with one TPU chip this exercises the sharded compile path on a
virtual CPU mesh (the driver's dryrun does the same); on a pod slice it
measures true ICI scaling. Select with --platform {cpu,tpu} --devices N.

Multi-HOST: `--hosts N` spawns N coordinated processes (jax.distributed +
gloo on CPU; on real pods run one process per host with UNISLAM_COORDINATOR
/ UNISLAM_NUM_PROCESSES / UNISLAM_PROCESS_ID set instead) and runs the same
step over the global host-spanning mesh.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--devices", type=int, default=8,
                    help="max mesh size (cpu: virtual devices)")
    ap.add_argument("--rays", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hosts", type=int, default=1,
                    help="simulate N hosts as N coordinated processes "
                         "(jax.distributed; cpu platform)")
    ap.add_argument("--_worker", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.hosts > 1 and args.platform is None:
        args.platform = "cpu"

    if args.hosts > 1 and args.platform == "cpu" and args._worker is None:
        # launcher: spawn one worker process per simulated host
        import socket
        import subprocess
        s = socket.socket(); s.bind(("localhost", 0))
        port = s.getsockname()[1]; s.close()
        per_host = max(1, args.devices // args.hosts)
        procs = []
        for pid in range(args.hosts):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--platform", "cpu", "--devices", str(per_host),
                   "--rays", str(args.rays), "--iters", str(args.iters),
                   "--hosts", str(args.hosts),
                   "--_worker", f"{port},{pid}"]
            env = {k: v for k, v in os.environ.items()
                   if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
            procs.append(subprocess.Popen(
                cmd, env=env,
                stdout=None if pid == 0 else subprocess.DEVNULL,
                stderr=subprocess.DEVNULL))
        rc = [p.wait() for p in procs]
        sys.exit(max(rc))

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}")

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    if args._worker is not None:
        from unislam_tpu.parallel import distributed as dist
        port, pid = args._worker.split(",")
        dist.initialize_from_env(coordinator=f"localhost:{port}",
                                 num_processes=args.hosts,
                                 process_id=int(pid))
    import jax.numpy as jnp
    import numpy as np

    from unislam_tpu.core.rays import Intrinsics, camera_ray_dirs
    from unislam_tpu.engine import keyframes as kf_lib
    from unislam_tpu.engine import mapper as mapper_lib
    from unislam_tpu.models import hash_encoding as he
    from unislam_tpu.models import scene as scene_lib
    from unislam_tpu.parallel import sharding as sh
    from unislam_tpu.render.renderer import RenderConfig

    n_avail = len(jax.devices())
    print(f"platform={jax.devices()[0].platform} devices={n_avail} "
          f"processes={jax.process_count()}")
    multiproc = jax.process_count() > 1

    intr = Intrinsics(H=120, W=160, fx=130.0, fy=130.0, cx=79.5, cy=59.5)
    bound = np.asarray([[-3.0, 3.0]] * 3, np.float32)
    sc = scene_lib.SceneConfig(
        sdf_spec=he.make_spec(n_levels=8, log2_hashmap_size=14,
                              desired_resolution=300),
        color_spec=he.make_spec(n_levels=8, log2_hashmap_size=14,
                                desired_resolution=300),
        bound=bound, truncation=0.06)
    rc = RenderConfig(n_stratified=32, n_importance=8, perturb=True)
    max_kf, bank_size = 8, 1024

    if multiproc:
        sizes = [n_avail]   # one global host-spanning mesh
    else:
        sizes = [n for n in [1, 2, 4, 8, 16, 32]
                 if n <= min(args.devices, n_avail)]
    results = []
    for n_dev in sizes:
        if multiproc:
            from unislam_tpu.parallel import distributed as dist
            mesh = dist.global_ray_mesh()
        else:
            mesh = sh.make_mesh(n_dev)
        per = max(1, args.rays // n_dev)
        mc = mapper_lib.MapperConfig(pixels=per * n_dev, iters=1,
                                     extra_rays=n_dev * 8)
        step, opt, _ = mapper_lib.make_mapping_step(sc, rc, mc, intr,
                                                    max_kf, bank_size,
                                                    mesh=mesh)

        params = scene_lib.init_params(jax.random.PRNGKey(0), sc)
        shardings = sh.scene_param_shardings(mesh, params)
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)

        bank = kf_lib.init_bank(max_kf, bank_size)
        add = kf_lib.make_add_keyframe(intr.H, intr.W, bank_size)
        depth = jnp.full((intr.H, intr.W), 1.5)
        color = jnp.full((intr.H, intr.W, 3), 0.5)
        rays_d = camera_ray_dirs(intr)
        eye = jnp.eye(4)
        for i in range(3):
            bank = add(bank, depth, color, rays_d, eye, eye, jnp.int32(i),
                       jax.random.PRNGKey(i))

        pose7 = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]),
                         (max_kf + 1, 1))
        opt_tree = {"scene": params, "poses": pose7}
        opt_state = opt.init(opt_tree)
        probs = np.zeros(max_kf + 1, np.float32)
        probs[[0, 1, 2, max_kf]] = 0.25
        pg = np.zeros((max_kf + 1, 1), np.float32)

        if multiproc:
            from unislam_tpu.parallel import distributed as dist
            rep = lambda t: dist.replicate(mesh, t)
            bank, depth, color, rays_d = rep((bank, depth, color, rays_d))
            opt_tree, opt_state = rep((opt_tree, opt_state))
            probs_j, pg_j = rep((jnp.asarray(probs), jnp.asarray(pg)))
            fetch = lambda x: float(dist.fetch_replicated(x))
        else:
            probs_j, pg_j = jnp.asarray(probs), jnp.asarray(pg)
            fetch = float

        def one(opt_tree, opt_state, key):
            if multiproc:
                from unislam_tpu.parallel import distributed as dist
                key = dist.replicate(mesh, key)
            return step(opt_tree, opt_state, bank, depth, color, rays_d,
                        probs_j, probs_j, pg_j, key, jnp.float32(1.0))

        key = jax.random.PRNGKey(7)
        opt_tree, opt_state, loss = one(opt_tree, opt_state, key)
        fetch(loss)  # force compile + completion
        t0 = time.time()
        for i in range(args.iters):
            opt_tree, opt_state, loss = one(opt_tree, opt_state,
                                            jax.random.fold_in(key, i))
        fetch(loss)
        dt = (time.time() - t0) / args.iters
        rays = mc.pixels + mc.extra_rays
        rps = rays / dt

        # tracking at the same mesh (VERDICT r4: the sweep covered mapping
        # only): the REAL fused whole-frame tracking dispatch, 8 iters
        from unislam_tpu.engine import tracker as tracker_lib
        tc = tracker_lib.TrackerConfig(pixels=per * n_dev, iters=8,
                                       ignore_edge_W=8, ignore_edge_H=8)
        _, topt, tframe = tracker_lib.make_tracking_step(sc, rc, tc, intr,
                                                         mesh=mesh)
        pose = {"R": jnp.asarray([1.0, 0, 0, 0]),
                "T": jnp.asarray([0.0, 0, 0])}
        tstate = topt.init(pose)
        if multiproc:
            pose, tstate = rep((pose, tstate))
        t_it = jnp.int32(8)

        def one_track(k):
            if multiproc:
                from unislam_tpu.parallel import distributed as dist
                k = dist.replicate(mesh, k)
            return tframe(opt_tree["scene"], pose, tstate, depth, color,
                          k, t_it)
        out = one_track(key)
        fetch(out[3])
        t0 = time.time()
        for i in range(args.iters):
            out = one_track(jax.random.fold_in(key, 100 + i))
        fetch(out[3])
        t_frame_dt = (time.time() - t0) / args.iters
        t_rps = tc.pixels * 8 / t_frame_dt

        # derived end-to-end frame-loop rate at the Replica cadence
        # (4 tracked frames + one 15-iter mapping phase per group),
        # composed from the two measured dispatch times
        group_s = 4 * t_frame_dt + 15 * dt
        fps = 4.0 / group_s

        results.append((n_dev, rps, t_rps, fps))
        base = results[0]
        print(f"devices={n_dev:3d}  rays/step={rays:6d}  "
              f"map step={dt*1e3:7.2f} ms  map rays/s={rps:12.1f} "
              f"({rps/base[1]:4.2f}x)  track rays/s={t_rps:12.1f} "
              f"({t_rps/base[2]:4.2f}x)  frame-loop fps={fps:6.2f} "
              f"({fps/base[3]:4.2f}x)")


if __name__ == "__main__":
    main()
