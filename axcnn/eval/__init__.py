from axcnn.eval.imagenet_c import run_imagenet_c, ALEXNET_ERR, CORRUPTIONS
