from axcnn.utils.logging import MetricLogger, Throughput
