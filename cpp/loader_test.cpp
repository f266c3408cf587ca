// Standalone harness for the native loader — used for the sanitizer configs
// (SURVEY.md §5.2): decodes every record of a TFRecord shard with a thread
// pool, twice (train + eval paths), and checks determinism.
//
// Build+run:
//   g++ -O1 -g -std=c++17 -fsanitize=thread loader.cpp loader_test.cpp \
//       -o build/loader_test_tsan -ljpeg -lpthread
//   build/loader_test_tsan <shard.tfrecord>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <vector>

extern "C" int axcnn_decode_batch(const uint8_t** payloads, const int64_t* sizes,
                                  int n, int image_size, int resize_min,
                                  int train, int dct_fast, int aa_policy,
                                  const uint64_t* seeds,
                                  uint8_t* out_images, int32_t* out_labels,
                                  int num_threads);

static std::vector<std::vector<uint8_t>> read_tfrecord(const char* path) {
  std::ifstream f(path, std::ios::binary);
  std::vector<std::vector<uint8_t>> out;
  while (true) {
    uint64_t len;
    uint32_t crc;
    if (!f.read(reinterpret_cast<char*>(&len), 8)) break;
    f.read(reinterpret_cast<char*>(&crc), 4);
    std::vector<uint8_t> payload(len);
    f.read(reinterpret_cast<char*>(payload.data()), len);
    f.read(reinterpret_cast<char*>(&crc), 4);
    if (!f) break;
    out.push_back(std::move(payload));
  }
  return out;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s <shard.tfrecord> [threads]\n", argv[0]);
    return 2;
  }
  int threads = argc > 2 ? std::atoi(argv[2]) : 4;
  auto records = read_tfrecord(argv[1]);
  if (records.empty()) {
    std::fprintf(stderr, "no records in %s\n", argv[1]);
    return 1;
  }
  int n = int(records.size());
  const int S = 64;
  std::vector<const uint8_t*> ptrs(n);
  std::vector<int64_t> sizes(n);
  std::vector<uint64_t> seeds(n);
  for (int i = 0; i < n; i++) {
    ptrs[i] = records[i].data();
    sizes[i] = int64_t(records[i].size());
    seeds[i] = uint64_t(i) * 2654435761ULL + 12345;
  }
  std::vector<uint8_t> img1(size_t(n) * S * S * 3), img2(img1.size());
  std::vector<int32_t> lab1(n), lab2(n);

  for (int train = 0; train <= 1; train++) {
    // train pass also exercises AutoAugment (policy v0) under the sanitizer
    int aa = train ? 0 : -1;
    int ok1 = axcnn_decode_batch(ptrs.data(), sizes.data(), n, S, 72, train, 0,
                                 aa, seeds.data(), img1.data(), lab1.data(),
                                 threads);
    int ok2 = axcnn_decode_batch(ptrs.data(), sizes.data(), n, S, 72, train, 0,
                                 aa, seeds.data(), img2.data(), lab2.data(),
                                 threads);
    if (ok1 != n || ok2 != n) {
      std::fprintf(stderr, "decode failures: %d/%d, %d/%d (train=%d)\n",
                   ok1, n, ok2, n, train);
      return 1;
    }
    if (std::memcmp(img1.data(), img2.data(), img1.size()) != 0 ||
        std::memcmp(lab1.data(), lab2.data(), n * 4) != 0) {
      std::fprintf(stderr, "non-deterministic decode (train=%d)\n", train);
      return 1;
    }
  }
  std::printf("loader_test OK: %d records x2 passes x{train,eval}, %d threads\n",
              n, threads);
  return 0;
}
