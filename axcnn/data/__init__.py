from axcnn.data.datasets import DATASETS, DatasetInfo
from axcnn.data.tfrecord import TFRecordReader, TFRecordWriter, parse_example, make_example
