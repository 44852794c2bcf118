// ThreadSanitizer harness for the chunk-parallel decode worker pool.
#include <cstdio>
#include <cstdlib>
#include <vector>
extern "C" {
void pcss_exr_set_threads(int n);
void* pcss_exr_open_file(const char* path);
int pcss_exr_dims(void* h, int* w, int* hh);
int pcss_exr_read_channels(void* h, const char* const* names,
                           float* const* dsts, int n, int* present);
const char* pcss_exr_error(void* h);
void pcss_exr_close(void* h);
}
int main(int argc, char** argv) {
  if (argc < 2) return 2;
  pcss_exr_set_threads(4);
  for (int rep = 0; rep < 5; ++rep) {
    void* h = pcss_exr_open_file(argv[1]);
    int w = 0, ht = 0;
    if (pcss_exr_dims(h, &w, &ht) != 0) {
      std::fprintf(stderr, "open failed: %s\n", pcss_exr_error(h));
      return 1;
    }
    std::vector<std::vector<float>> planes(4,
        std::vector<float>((size_t)w * ht));
    const char* names[4] = {"R", "G", "B", "A"};
    float* dsts[4];
    for (int k = 0; k < 4; ++k) dsts[k] = planes[k].data();
    int present[4];
    if (pcss_exr_read_channels(h, names, dsts, 4, present) != 0) {
      std::fprintf(stderr, "read failed: %s\n", pcss_exr_error(h));
      return 1;
    }
    pcss_exr_close(h);
  }
  std::puts("tsan harness ok");
  return 0;
}
