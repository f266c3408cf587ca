from axcnn.core.dtypes import Policy, DEFAULT_POLICY, BF16_POLICY
from axcnn.core.rng import RngStream
from axcnn.core.tree import tree_count_params, tree_map_with_path, flatten_named
