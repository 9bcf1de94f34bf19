// Minimal image I/O + box drawing for the native detector demo.
//
// Role parity: ref demo/TensorRT/cpp/yolox.cpp:166-208 (draw_objects) —
// the reference leans on OpenCV for imread/rectangle/putText; this build
// stays dependency-free with binary PPM (P6) in/out, procedural per-class
// colors, and a tiny 4x6 bitmap font for "<cls> <score>" labels.  Convert
// any image to PPM with e.g. `python -c "from PIL import Image;
// Image.open('x.jpg').save('x.ppm')"` or ImageMagick `convert`.

#ifndef COCODET_SERVING_IMAGE_IO_H_
#define COCODET_SERVING_IMAGE_IO_H_

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace image_io {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // HWC, 3 channels
};

// Binary PPM (P6), maxval 255.
inline bool ReadPPM(const char* path, Image* img) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  char magic[3] = {0};
  if (std::fscanf(f, "%2s", magic) != 1 || std::strcmp(magic, "P6") != 0) {
    std::fclose(f);
    return false;
  }
  // header tokens may be separated by whitespace/comments
  auto next_int = [&]() -> int {
    int c;
    for (;;) {
      c = std::fgetc(f);
      if (c == '#') {
        while (c != '\n' && c != EOF) c = std::fgetc(f);
      } else if (!std::isspace(c)) {
        break;
      }
    }
    int v = 0;
    while (std::isdigit(c)) {
      v = v * 10 + (c - '0');
      c = std::fgetc(f);
    }
    return v;
  };
  img->w = next_int();
  img->h = next_int();
  const int maxval = next_int();
  if (img->w <= 0 || img->h <= 0 || maxval != 255) {
    std::fclose(f);
    return false;
  }
  img->rgb.resize(static_cast<size_t>(img->w) * img->h * 3);
  const size_t got = std::fread(img->rgb.data(), 1, img->rgb.size(), f);
  std::fclose(f);
  return got == img->rgb.size();
}

inline bool WritePPM(const char* path, const Image& img) {
  std::FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  std::fprintf(f, "P6\n%d %d\n255\n", img.w, img.h);
  const size_t put = std::fwrite(img.rgb.data(), 1, img.rgb.size(), f);
  std::fclose(f);
  return put == img.rgb.size();
}

// Procedural per-class color: golden-angle hue walk, full saturation.
inline void ClassColor(int cls, uint8_t* r, uint8_t* g, uint8_t* b) {
  const float h = static_cast<float>((cls * 137) % 360) / 60.0f;
  const int i = static_cast<int>(h) % 6;
  const float fr = h - static_cast<int>(h);
  const float q = 1.0f - fr;
  float rgb[3] = {0, 0, 0};
  switch (i) {
    case 0: rgb[0] = 1; rgb[1] = fr; break;
    case 1: rgb[0] = q; rgb[1] = 1; break;
    case 2: rgb[1] = 1; rgb[2] = fr; break;
    case 3: rgb[1] = q; rgb[2] = 1; break;
    case 4: rgb[0] = fr; rgb[2] = 1; break;
    default: rgb[0] = 1; rgb[2] = q; break;
  }
  *r = static_cast<uint8_t>(55 + 200 * rgb[0]);
  *g = static_cast<uint8_t>(55 + 200 * rgb[1]);
  *b = static_cast<uint8_t>(55 + 200 * rgb[2]);
}

inline void SetPixel(Image* img, int x, int y, uint8_t r, uint8_t g,
                     uint8_t b) {
  if (x < 0 || y < 0 || x >= img->w || y >= img->h) return;
  uint8_t* p = &img->rgb[(static_cast<size_t>(y) * img->w + x) * 3];
  p[0] = r;
  p[1] = g;
  p[2] = b;
}

inline void DrawRect(Image* img, int x0, int y0, int x1, int y1, uint8_t r,
                     uint8_t g, uint8_t b, int thickness = 2) {
  for (int t = 0; t < thickness; ++t) {
    for (int x = x0; x <= x1; ++x) {
      SetPixel(img, x, y0 + t, r, g, b);
      SetPixel(img, x, y1 - t, r, g, b);
    }
    for (int y = y0; y <= y1; ++y) {
      SetPixel(img, x0 + t, y, r, g, b);
      SetPixel(img, x1 - t, y, r, g, b);
    }
  }
}

// 4x6 bitmap glyphs for digits, '.', ' ' — enough for "<cls> <score>".
inline const uint8_t* Glyph(char c) {
  static const uint8_t kGlyphs[12][6] = {
      {0x6, 0x9, 0x9, 0x9, 0x9, 0x6},  // 0
      {0x2, 0x6, 0x2, 0x2, 0x2, 0x7},  // 1
      {0x6, 0x9, 0x1, 0x6, 0x8, 0xF},  // 2
      {0x6, 0x9, 0x2, 0x1, 0x9, 0x6},  // 3
      {0x9, 0x9, 0x9, 0xF, 0x1, 0x1},  // 4
      {0xF, 0x8, 0xE, 0x1, 0x9, 0x6},  // 5
      {0x6, 0x8, 0xE, 0x9, 0x9, 0x6},  // 6
      {0xF, 0x1, 0x2, 0x2, 0x4, 0x4},  // 7
      {0x6, 0x9, 0x6, 0x9, 0x9, 0x6},  // 8
      {0x6, 0x9, 0x9, 0x7, 0x1, 0x6},  // 9
      {0x0, 0x0, 0x0, 0x0, 0x0, 0x2},  // .
      {0x0, 0x0, 0x0, 0x0, 0x0, 0x0},  // space
  };
  if (c >= '0' && c <= '9') return kGlyphs[c - '0'];
  if (c == '.') return kGlyphs[10];
  return kGlyphs[11];
}

inline void DrawText(Image* img, int x, int y, const std::string& text,
                     uint8_t r, uint8_t g, uint8_t b, int scale = 2) {
  for (char c : text) {
    const uint8_t* glyph = Glyph(c);
    for (int gy = 0; gy < 6; ++gy)
      for (int gx = 0; gx < 4; ++gx)
        if (glyph[gy] & (0x8 >> gx))
          for (int sy = 0; sy < scale; ++sy)
            for (int sx = 0; sx < scale; ++sx)
              SetPixel(img, x + gx * scale + sx, y + gy * scale + sy, r, g,
                       b);
    x += 5 * scale;
  }
}

}  // namespace image_io

#endif  // COCODET_SERVING_IMAGE_IO_H_
