from icee_tpu.train import optim, steps, loops
