from axcnn.models.resnet import ModelConfig, resnet_init, resnet_apply, RESNET_BLOCKS
