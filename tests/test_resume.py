"""GAN train-loop checkpoint/resume (reference --continue_train,
models/base_model.py:60-80 + train.py resume semantics)."""

import numpy as np
import pytest

from mmhand_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    OptimConfig,
    RunConfig,
)


@pytest.mark.slow
def test_gan_loop_continue_train(tmp_path):
    import jax
    from mmhand_tpu.train.loop import train

    def cfg(resume):
        return Config(
            model=ModelConfig(fine_size=32, g_n_blocks=1, ngf=8, ndf=8),
            optim=OptimConfig(pool_size=2, lr_policy="plateau"),
            data=DataConfig(dataset="synthetic", batch_size=8),
            run=RunConfig(name="resgan", checkpoints_dir=str(tmp_path),
                          print_freq=1000, display_freq=1000,
                          save_latest_freq=1000, continue_train=resume))

    r1 = train(cfg(False), max_steps=1)
    assert r1.steps == 1
    step1 = int(np.asarray(jax.device_get(r1.state.step)).reshape(-1)[0])

    r2 = train(cfg(True), max_steps=1)
    assert np.isfinite(list(r2.last_metrics.values())).all()
    step2 = int(np.asarray(jax.device_get(r2.state.step)).reshape(-1)[0])
    # restored state continues counting from the saved step
    assert step2 == step1 + 1
    # plateau sidecar written
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "resgan",
                                       "lr_sched.json"))
