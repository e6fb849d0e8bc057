// fastcsv — minimal high-throughput numeric CSV reader.
//
// Native data-loader for the framework's host-side ingestion path
// (the reference delegates CSV parsing to pandas,
// /root/reference/utils/dataprep.py:9-12; this is the compiled
// equivalent).  Parses a headered CSV of floats into a contiguous
// row-major float64 buffer in a single pass: no per-cell Python objects,
// no intermediate strings — strtod straight into the output array.
//
// C ABI (ctypes-friendly):
//   fastcsv_dims(path, *rows, *cols)        -> 0 on success
//   fastcsv_read(path, out, rows, cols)     -> number of rows read (<0 err)
//
// Build: make -C csrc   (g++ -O3 -shared -fPIC fastcsv.cpp -o libfastcsv.so)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <vector>

namespace {

// Read entire file into a buffer; returns empty on failure.
std::vector<char> slurp(const char* path) {
    std::vector<char> buf;
    FILE* f = std::fopen(path, "rb");
    if (!f) return buf;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (size > 0) {
        buf.resize(static_cast<size_t>(size) + 1);
        size_t got = std::fread(buf.data(), 1, static_cast<size_t>(size), f);
        buf.resize(got + 1);
        buf[got] = '\0';
    }
    std::fclose(f);
    return buf;
}

inline const char* next_line(const char* p) {
    while (*p && *p != '\n') ++p;
    return *p ? p + 1 : p;
}

}  // namespace

extern "C" {

// Count data rows and columns (header skipped). Returns 0 on success.
int fastcsv_dims(const char* path, long* rows, long* cols) {
    std::vector<char> buf = slurp(path);
    if (buf.size() <= 1) return -1;
    const char* p = buf.data();

    // columns from the header line
    long c = 1;
    for (const char* q = p; *q && *q != '\n'; ++q)
        if (*q == ',') ++c;
    p = next_line(p);

    long r = 0;
    while (*p) {
        if (*p != '\n' && *p != '\r') ++r;
        p = next_line(p);
    }
    *rows = r;
    *cols = c;
    return 0;
}

// Parse into caller-allocated out[rows*cols] (row-major float64).
// Empty cells parse as NaN (pandas parity); any other unparseable or
// trailing-garbage cell aborts with -2 so the caller can fall back to a
// strict parser instead of receiving fabricated values.
// Returns rows actually parsed, or <0 on error.
long fastcsv_read(const char* path, double* out, long rows, long cols) {
    std::vector<char> buf = slurp(path);
    if (buf.size() <= 1) return -1;
    const char* p = next_line(buf.data());  // skip header

    long r = 0;
    while (*p && r < rows) {
        if (*p == '\n' || *p == '\r') {
            p = next_line(p);
            continue;
        }
        double* row = out + r * cols;
        long c = 0;
        while (c < cols) {
            // Scan the cell span [s, e) on THIS line first.  Calling
            // strtod at the raw cursor is wrong for a trailing empty
            // cell: strtod skips leading '\n' and steals the next line's
            // first value (and a short row would steal the same way).
            const char* q = p;
            while (*q && *q != ',' && *q != '\n') ++q;
            const char* s = p;
            while (s < q && (*s == ' ' || *s == '\t' || *s == '\r')) ++s;
            const char* e = q;
            while (e > s && (e[-1] == ' ' || e[-1] == '\t' || e[-1] == '\r')) --e;
            if (s == e) {
                row[c] = std::numeric_limits<double>::quiet_NaN();  // empty → NaN
            } else {
                char* end = nullptr;
                row[c] = std::strtod(s, &end);
                if (end != e) return -2;  // unparseable / trailing garbage
            }
            ++c;
            p = q;
            if (c < cols) {
                if (*p != ',') return -2;  // fewer fields than the header
                ++p;
            }
        }
        // strict-parser parity with the pandas fallback: a row with MORE
        // fields than the header is an error, not a silent truncation
        if (*p == ',') return -2;
        ++r;
        p = next_line(p);
    }
    return r;
}

}  // extern "C"
