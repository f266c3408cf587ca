from axcnn.ckpt.checkpoint import CheckpointManager
