// Parallel CSV parser — the native ingest path (reference:
// monetdb5/modules/mal/tablet.c, SQLload_file :1562: reader splits the
// input into chunks at row boundaries, worker threads parse fields and
// convert per column in parallel).
//
// Exposed as a C ABI for ctypes:
//   csv_count_rows(buf, len)                      → row count (parallel)
//   csv_parse(buf, len, delim, ncols, types, scales, nthreads, nrows, outs)
//     types per column: 0=int64  1=float64  2=date(YYYY-MM-DD → epoch days,
//     int32)  3=decimal(scale → scaled int64)  4=string (two int64 outputs:
//     byte offset and length into buf; the Python side dict-encodes)
//     NULL = empty field or the literal NULL → int64/date min, NaN, len -1.
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread csvparse.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <cstdlib>
#include <thread>
#include <vector>

namespace {

constexpr int64_t I64_NIL = INT64_MIN;
constexpr int32_t I32_NIL = INT32_MIN;

struct ColOut {
    int type;
    int scale;
    void* a;       // primary output
    void* b;       // secondary (string length)
};

inline bool is_null_field(const char* s, long n) {
    if (n == 0) return true;
    return n == 4 && (std::memcmp(s, "NULL", 4) == 0 ||
                      std::memcmp(s, "null", 4) == 0);
}

inline int64_t parse_int(const char* s, long n, bool* ok) {
    long i = 0;
    bool neg = false;
    if (i < n && (s[i] == '-' || s[i] == '+')) { neg = s[i] == '-'; i++; }
    int64_t v = 0;
    bool any = false;
    for (; i < n; i++) {
        char c = s[i];
        if (c < '0' || c > '9') { *ok = false; return 0; }
        v = v * 10 + (c - '0');
        any = true;
    }
    *ok = any;
    return neg ? -v : v;
}

inline int64_t parse_decimal(const char* s, long n, int scale, bool* ok) {
    long i = 0;
    bool neg = false;
    if (i < n && (s[i] == '-' || s[i] == '+')) { neg = s[i] == '-'; i++; }
    int64_t v = 0;
    int frac = -1;  // digits seen after the dot
    bool any = false;
    for (; i < n; i++) {
        char c = s[i];
        if (c == '.') {
            if (frac >= 0) { *ok = false; return 0; }
            frac = 0;
            continue;
        }
        if (c < '0' || c > '9') { *ok = false; return 0; }
        if (frac >= 0) {
            if (frac < scale) { v = v * 10 + (c - '0'); frac++; }
            // extra fractional digits beyond scale: truncate (reference
            // COPY INTO rounds; keep truncation + round on first extra)
            else if (frac == scale) { if (c >= '5') v += 1; frac++; }
        } else {
            v = v * 10 + (c - '0');
        }
        any = true;
    }
    if (frac < 0) frac = 0;
    for (; frac < scale; frac++) v *= 10;
    *ok = any;
    return neg ? -v : v;
}

// Howard Hinnant's civil → days algorithm (public domain) — matches the
// engine's datecalc kernels.
inline int32_t days_from_civil(int y, int m, int d) {
    y -= m <= 2;
    const int era = (y >= 0 ? y : y - 399) / 400;
    const unsigned yoe = static_cast<unsigned>(y - era * 400);
    const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
    const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
    return era * 146097 + static_cast<int>(doe) - 719468;
}

inline int32_t parse_date(const char* s, long n, bool* ok) {
    if (n < 8) { *ok = false; return 0; }
    int y = 0, m = 0, d = 0;
    long i = 0;
    bool neg = false;
    if (s[i] == '-') { neg = true; i++; }
    while (i < n && s[i] != '-') {
        if (s[i] < '0' || s[i] > '9') { *ok = false; return 0; }
        y = y * 10 + (s[i] - '0'); i++;
    }
    if (neg) y = -y;
    if (i >= n) { *ok = false; return 0; }
    i++;
    while (i < n && s[i] != '-') {
        if (s[i] < '0' || s[i] > '9') { *ok = false; return 0; }
        m = m * 10 + (s[i] - '0'); i++;
    }
    if (i >= n) { *ok = false; return 0; }
    i++;
    while (i < n) {
        if (s[i] < '0' || s[i] > '9') { *ok = false; return 0; }
        d = d * 10 + (s[i] - '0'); i++;
    }
    if (m < 1 || m > 12 || d < 1 || d > 31) { *ok = false; return 0; }
    *ok = true;
    return days_from_civil(y, m, d);
}

void parse_range(const char* buf, long begin, long end, char delim,
                 int ncols, const ColOut* cols, long row0, int* err) {
    long row = row0;
    long i = begin;
    while (i < end) {
        long line_end = i;
        while (line_end < end && buf[line_end] != '\n') line_end++;
        long fstart = i;
        for (int c = 0; c < ncols; c++) {
            long fend = fstart;
            long stop = line_end;
            while (fend < stop && buf[fend] != delim) fend++;
            long flen = fend - fstart;
            // strip one trailing \r on the last field
            if (c == ncols - 1 && flen > 0 && buf[fstart + flen - 1] == '\r')
                flen--;
            const ColOut& co = cols[c];
            bool ok = true;
            bool isnull = is_null_field(buf + fstart, flen);
            switch (co.type) {
            case 0: {
                int64_t* out = static_cast<int64_t*>(co.a);
                out[row] = isnull ? I64_NIL
                                  : parse_int(buf + fstart, flen, &ok);
                break; }
            case 1: {
                double* out = static_cast<double*>(co.a);
                if (isnull) { out[row] = NAN; break; }
                char tmp[64];
                long m = flen < 63 ? flen : 63;
                std::memcpy(tmp, buf + fstart, m);
                tmp[m] = 0;
                char* endp = nullptr;
                out[row] = std::strtod(tmp, &endp);
                ok = endp && *endp == 0;
                break; }
            case 2: {
                int32_t* out = static_cast<int32_t*>(co.a);
                out[row] = isnull ? I32_NIL
                                  : parse_date(buf + fstart, flen, &ok);
                break; }
            case 3: {
                int64_t* out = static_cast<int64_t*>(co.a);
                out[row] = isnull ? I64_NIL
                    : parse_decimal(buf + fstart, flen, co.scale, &ok);
                break; }
            case 4: {
                int64_t* off = static_cast<int64_t*>(co.a);
                int64_t* len = static_cast<int64_t*>(co.b);
                off[row] = fstart;
                len[row] = flen;   // NULL for strings = empty field stays ""
                break; }
            default:
                ok = false;
            }
            if (!ok) *err = static_cast<int>(c) + 1;
            fstart = fend + 1;
        }
        row++;
        i = line_end + 1;
    }
}

}  // namespace

extern "C" {

long csv_count_rows(const char* buf, long len) {
    if (len <= 0) return 0;
    unsigned nt = std::thread::hardware_concurrency();
    if (nt == 0) nt = 4;
    std::vector<long> counts(nt, 0);
    std::vector<std::thread> ts;
    long chunk = (len + nt - 1) / nt;
    for (unsigned t = 0; t < nt; t++) {
        long b = t * chunk, e = std::min<long>(len, b + chunk);
        ts.emplace_back([&, b, e, t] {
            long n = 0;
            for (long i = b; i < e; i++) n += buf[i] == '\n';
            counts[t] = n;
        });
    }
    for (auto& th : ts) th.join();
    long total = 0;
    for (long c : counts) total += c;
    if (buf[len - 1] != '\n') total++;   // unterminated last line
    return total;
}

// Returns 0 on success, else 1-based column index of the first parse error.
int csv_parse(const char* buf, long len, char delim, int ncols,
              const int* types, const int* scales, int nthreads,
              void** outs_a, void** outs_b) {
    if (len <= 0) return 0;
    std::vector<ColOut> cols(ncols);
    for (int c = 0; c < ncols; c++)
        cols[c] = ColOut{types[c], scales[c], outs_a[c],
                         outs_b ? outs_b[c] : nullptr};
    if (nthreads <= 0) {
        nthreads = static_cast<int>(std::thread::hardware_concurrency());
        if (nthreads <= 0) nthreads = 4;
    }
    // chunk boundaries snapped to row starts (tablet.c reader split)
    std::vector<long> starts;
    starts.push_back(0);
    long chunk = (len + nthreads - 1) / nthreads;
    for (int t = 1; t < nthreads; t++) {
        long p = std::min<long>(len, static_cast<long>(t) * chunk);
        while (p < len && buf[p - 1] != '\n') p++;
        starts.push_back(p);
    }
    starts.push_back(len);
    // per-chunk row counts → starting row index per chunk
    std::vector<long> rows0(nthreads + 1, 0);
    {
        std::vector<std::thread> ts;
        std::vector<long> cnt(nthreads, 0);
        for (int t = 0; t < nthreads; t++) {
            long b = starts[t], e = starts[t + 1];
            ts.emplace_back([&, b, e, t] {
                long n = 0;
                for (long i = b; i < e; i++) n += buf[i] == '\n';
                if (e == len && len > 0 && buf[len - 1] != '\n' && e > b) n++;
                cnt[t] = n;
            });
        }
        for (auto& th : ts) th.join();
        for (int t = 0; t < nthreads; t++) rows0[t + 1] = rows0[t] + cnt[t];
    }
    std::vector<int> errs(nthreads, 0);
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; t++) {
        long b = starts[t], e = starts[t + 1];
        ts.emplace_back(parse_range, buf, b, e, delim, ncols, cols.data(),
                        rows0[t], &errs[t]);
    }
    for (auto& th : ts) th.join();
    for (int e : errs) if (e) return e;
    return 0;
}

}  // extern "C"
