#!/usr/bin/env python
"""Training CLI — the `maxk_gnn_integrated.py` driver analog.

  python train.py --dataset reddit --model sage --maxk 32 --epochs 3000
  python train.py --dataset flickr --model gcn --nonlinear relu ...
  python train.py --dataset reddit --mesh_shape 8 ...   (sharded)

Experiment artifacts land in `{path}/{dataset}_seed{seed}/{model}_{nonlinear}`
(reference layout, `scripts_train/*.sh`).
"""

import os

import jax
import numpy as np


def main(argv=None):
    from maxk_tpu.data.datasets import load_dataset
    from maxk_tpu.train.config import parse_args
    from maxk_tpu.train.logging import ScalarWriter, experiment_dir, get_logger

    cfg = parse_args(argv)
    exp = experiment_dir(cfg)
    logger = get_logger(os.path.join(exp, "train.log"))
    writer = ScalarWriter(exp)
    writer.add_text("config", cfg.as_markdown())
    logger.info(f"config: {cfg}")
    logger.info(f"devices: {jax.devices()}")

    np.random.seed(cfg.seed)
    data = load_dataset(
        cfg.dataset, scale=cfg.data_scale, seed=123, feat_snr=cfg.feat_snr
    )
    logger.info(
        f"dataset {cfg.dataset}: V={data.csr.num_nodes} E={data.csr.nnz} "
        f"F={data.feat_dim} C={data.num_classes} multilabel={data.multilabel}"
    )

    if cfg.mesh_shape > 1:
        run_sharded(cfg, data, logger, writer)
    else:
        run_single(cfg, data, logger, writer, exp)
    writer.close()


def run_single(cfg, data, logger, writer, exp):
    from maxk_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from maxk_tpu.train.loop import evaluate, setup, train

    if cfg.evaluate:
        from maxk_tpu.train.loop import _ckpt_payload

        state = setup(cfg, data)
        # restore FULL variables (incl. batch_stats for gnn_res), not
        # just params — eval with empty batch_stats would be garbage
        restored = restore_checkpoint(cfg.evaluate, _ckpt_payload(state, 0))
        state.variables = restored["variables"]
        tr, va, te = evaluate(state, data)
        logger.info(f"eval-only: train {tr:.4f} val {va:.4f} test {te:.4f}")
        return
    state = train(cfg, data, logger, writer, checkpoint_dir=exp)
    if cfg.save_model:
        from maxk_tpu.train.loop import _ckpt_payload

        save_checkpoint(
            exp, _ckpt_payload(state, cfg.epochs - 1), step=cfg.epochs, is_best=True
        )
        logger.info(f"saved model to {exp}")


def run_sharded(cfg, data, logger, writer):
    import time

    import jax.numpy as jnp

    from maxk_tpu.parallel.mesh import make_mesh
    from maxk_tpu.parallel.train import (
        make_sharded_eval_step,
        make_sharded_train_step,
        sharded_setup,
    )
    try:
        mesh = make_mesh(cfg.mesh_shape)
    except ValueError:
        # single-chip TPU tunnel: fall back to virtual CPU devices when
        # enough exist (xla_force_host_platform_device_count), else re-raise
        cpus = jax.devices("cpu")
        if len(cpus) < cfg.mesh_shape:
            raise
        logger.info(
            f"falling back to a {cfg.mesh_shape}-device virtual CPU mesh"
        )
        mesh = make_mesh(devices=cpus[: cfg.mesh_shape])
    if mesh.devices.flat[0].platform != "tpu":
        # TPU-only Pallas kernels can't lower for CPU mesh devices
        import os

        os.environ["MAXK_TPU_DISABLE_PALLAS"] = "1"
    logger.info(f"mesh: {mesh}")
    model, variables, opt_state, sgraph, arrays, tx = sharded_setup(
        cfg, data, mesh
    )
    metric = "rocauc" if data.name == "ogbn-proteins" else "f1"
    train_step = make_sharded_train_step(model, tx, data.multilabel, mesh)
    eval_step = make_sharded_eval_step(model, data.multilabel, mesh, metric)
    rng = jax.random.PRNGKey(cfg.seed)
    best_val = best_test = 0.0
    times = []
    for epoch in range(cfg.epochs):
        # per-epoch key by fold-in (not split-chain) so a resumed run
        # replays the identical stream from any epoch
        srng = jax.random.fold_in(rng, epoch)
        t0 = time.perf_counter()
        variables, opt_state, loss, _ = train_step(
            variables, opt_state, srng, sgraph,
            arrays["feats"], arrays["labels"], arrays["train"],
        )
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        if epoch >= 10:
            times.append(dt)
        # one batched host fetch (loss + metrics): sequential float()
        # pays a full tunnel roundtrip each — see train/loop.py
        loss, tr, va, te = (
            float(q) for q in jax.device_get(
                (loss,) + tuple(eval_step(
                    variables, sgraph, arrays["feats"], arrays["labels"],
                    (arrays["train"], arrays["val"], arrays["test"]),
                ))
            )
        )
        if va > best_val:
            best_val, best_test = va, te
        writer.add_scalar("loss", float(loss), epoch)
        writer.add_scalar("val_acc", va, epoch)
        logger.info(
            f"epoch {epoch:05d} | loss {float(loss):.4f} | train {tr:.4f} "
            f"| val {va:.4f} | test {te:.4f} | {dt*1e3:.1f} ms"
        )
    if times:
        logger.info(f"avg epoch time: {1e3*np.mean(times):.2f} ms")
    logger.info(f"best val {best_val:.4f} | best test {best_test:.4f}")


if __name__ == "__main__":
    main()
