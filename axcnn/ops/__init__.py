from axcnn.ops.conv import conv_init, conv_apply, dense_init, dense_apply
from axcnn.ops.norm import bn_init, bn_apply
from axcnn.ops.pooling import max_pool_same, global_avg_pool, avg_pool
from axcnn.ops.blurpool import blur_kernel, blur_pool
from axcnn.ops.se import se_init, se_apply
from axcnn.ops.sk import sk_init, sk_apply
from axcnn.ops.dropblock import dropblock
