// Standalone TSAN harness for the native decoder (the TSAN runtime
// cannot be dlopen'd into Python, so this drives process_paf directly).
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" int process_paf(const float*, const float*, const float*, int,
                           int, float*, float*, int, float, float, int,
                           int, float, int);

int main() {
  const int h = 92, w = 108;
  std::vector<float> peaks(h * w * 19, 0.f), heat(h * w * 19, 0.f),
      paf(h * w * 38, 0.f);
  // two synthetic peaks + a PAF bridge (neck->rshoulder, pair 0, ch 12/13)
  auto at = [&](int y, int x, int c) -> float& {
    return peaks[(y * w + x) * 19 + c];
  };
  at(40, 40, 1) = 0.9f;   // neck
  at(40, 60, 2) = 0.8f;   // rshoulder
  at(60, 40, 8) = 0.7f;   // rhip
  for (int x = 40; x <= 60; ++x) paf[(40 * w + x) * 38 + 12] = 1.0f;
  for (int y = 40; y <= 60; ++y) paf[(y * w + 40) * 38 + 3] = 1.0f;
  std::vector<float> parts(32 * 18 * 4), scores(32);
  int n = process_paf(peaks.data(), heat.data(), paf.data(), h, w,
                      parts.data(), scores.data(), 32, 0.05f, 0.05f, 8,
                      2 /*relaxed count for the tiny scene*/, 0.1f, 10);
  printf("humans=%d\n", n);
  return n >= 1 ? 0 : 1;
}
