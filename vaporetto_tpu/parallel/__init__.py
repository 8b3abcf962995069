from .mesh import make_mesh, shard_predict_fn, train_step_dryrun

__all__ = ["make_mesh", "shard_predict_fn", "train_step_dryrun"]
