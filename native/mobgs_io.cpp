// mobgs_io — native host-side IO for mobgs_tpu.
//
// The reference depends on the C-backed `plyfile` package for its
// checkpoint hot path (60k+ Gaussians x ~130 float32 attributes per
// save, written at every save_iteration and on every best-PSNR event,
// reference scene/__init__.py:116-138). This library provides the
// equivalent native codec: single-pass binary-little-endian PLY
// encode/decode operating directly on a packed row-major float32
// matrix, exposed through a C ABI consumed via ctypes (no pybind11 in
// this image).
//
// Build: see mobgs_tpu/io/native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// Write a binary_little_endian PLY with float32 vertex properties.
// names: '\n'-separated property names. data: row-major [n_rows, n_cols].
// Returns 0 on success.
int ply_write_f32(const char* path, const char* names, int64_t n_rows,
                  int64_t n_cols, const float* data) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    std::string header = "ply\nformat binary_little_endian 1.0\n";
    header += "element vertex " + std::to_string(n_rows) + "\n";
    {
        const char* p = names;
        while (*p) {
            const char* e = strchr(p, '\n');
            size_t len = e ? (size_t)(e - p) : strlen(p);
            header += "property float ";
            header.append(p, len);
            header += "\n";
            p += len + (e ? 1 : 0);
            if (!e) break;
        }
    }
    header += "end_header\n";
    if (fwrite(header.data(), 1, header.size(), f) != header.size()) {
        fclose(f);
        return 2;
    }
    // data is already row-major float32 little-endian on every platform
    // this runs on; stream it in large chunks.
    const size_t total = (size_t)n_rows * (size_t)n_cols;
    size_t written = fwrite(data, sizeof(float), total, f);
    fclose(f);
    return written == total ? 0 : 3;
}

// Probe a PLY: returns 0 and fills n_rows/n_cols/header_size, or nonzero.
int ply_probe(const char* path, int64_t* n_rows, int64_t* n_cols,
              int64_t* header_size, char* names_out, int64_t names_cap) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    std::string header;
    char line[512];
    bool ok = false;
    int64_t rows = 0, cols = 0;
    std::string names;
    while (fgets(line, sizeof(line), f)) {
        header += line;
        std::string s(line);
        while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
        if (s.rfind("element vertex ", 0) == 0) {
            rows = atoll(s.c_str() + 15);
        } else if (s.rfind("property float ", 0) == 0) {
            names += s.substr(15) + "\n";
            cols++;
        } else if (s.rfind("property ", 0) == 0) {
            fclose(f);
            return 4;  // non-float property unsupported
        } else if (s == "end_header") {
            ok = true;
            break;
        }
    }
    fclose(f);
    if (!ok) return 2;
    if ((int64_t)names.size() + 1 > names_cap) return 3;
    memcpy(names_out, names.c_str(), names.size() + 1);
    *n_rows = rows;
    *n_cols = cols;
    *header_size = (int64_t)header.size();
    return 0;
}

// Read the vertex payload into out [n_rows * n_cols] (after ply_probe).
int ply_read_f32(const char* path, int64_t header_size, int64_t n_rows,
                 int64_t n_cols, float* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    if (fseek(f, (long)header_size, SEEK_SET) != 0) {
        fclose(f);
        return 2;
    }
    const size_t total = (size_t)n_rows * (size_t)n_cols;
    size_t got = fread(out, sizeof(float), total, f);
    fclose(f);
    return got == total ? 0 : 3;
}

}  // extern "C"
