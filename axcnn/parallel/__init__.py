from axcnn.parallel.mesh import make_mesh, shard_train_step, shard_eval_step, shard_batch
