// Native I/O for Armon-TPU: fast writer/reader/comparator for the
// gnuplot-pm3d CSV state files (`src/io.jl:4-43` of the reference).
//
// This is the framework's native runtime tier for host-side I/O: at
// production scales (16384^2 = 2.7e8 cells x 6 saved vars) the Python
// formatter is minutes-slow; this C++ implementation streams the same
// byte-identical format (C printf %#w.pe, the same formatting the Julia
// reference uses via @printf) at disk speed.
//
// Exposed with a plain C ABI and loaded via ctypes (no pybind11 in the
// image). Build: `make -C armon_tpu/native` (or auto-built on first use).

#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <locale.h>

// The format contract is byte-identical C-locale output ('.' decimal
// separator) and C-locale strtod parsing, regardless of what LC_NUMERIC
// the host Python process has set (any library calling
// locale.setlocale(LC_ALL, "") under e.g. de_DE would otherwise make
// fprintf emit ',' decimals — colliding with the field separator — and
// make strtod stop at '.'). RAII guard: pin the calling thread to the C
// locale for the duration of each entry point.
namespace {
struct CLocaleGuard {
    locale_t c_loc;
    locale_t old_loc;
    CLocaleGuard() {
        c_loc = newlocale(LC_NUMERIC_MASK, "C", (locale_t)0);
        old_loc = c_loc ? uselocale(c_loc) : (locale_t)0;
    }
    ~CLocaleGuard() {
        if (c_loc) {
            uselocale(old_loc);
            freelocale(c_loc);
        }
    }
};
}  // namespace

extern "C" {

// Write `rows x cols` cells of `nvars` row-major (rows, cols) double arrays
// as lines of ", "-joined "%#(p+7).(p)e" fields, with a blank line between
// rows when for_3d != 0. Returns 0 on success, errno-style negative on error.
int armon_write_cells(const char* path, const double** vars, long nvars,
                      long rows, long cols, int precision, int for_3d,
                      const char* header) {
    CLocaleGuard loc;
    FILE* f = fopen(path, "w");
    if (!f) return -1;
    // Large stdio buffer: the format is ~25 bytes per field.
    setvbuf(f, nullptr, _IOFBF, 1 << 22);

    if (header && header[0]) {
        fputs(header, f);
        fputc('\n', f);
    }

    char fmt[32];
    snprintf(fmt, sizeof(fmt), "%%#%d.%de", precision + 7, precision);

    for (long j = 0; j < rows; j++) {
        if (for_3d && j > 0) fputc('\n', f);
        for (long i = 0; i < cols; i++) {
            long idx = j * cols + i;
            for (long v = 0; v < nvars; v++) {
                if (v) fputs(", ", f);
                fprintf(f, fmt, vars[v][idx]);
            }
            fputc('\n', f);
        }
    }
    // Most bytes sit in the 4 MiB stdio buffer until fclose() flushes:
    // a disk-full/quota error often ONLY surfaces there, so its return
    // value must be part of the success check.
    int err = ferror(f);
    if (fclose(f) != 0) err = 1;
    return err ? -2 : 0;
}

// Parse all ','-separated doubles from `path` (blank lines skipped) into
// `out` (capacity `max_vals`). `skip_lines` initial lines are ignored
// (golden-file headers). Returns the number of values read, or negative on
// error / overflow.
long armon_read_cells(const char* path, double* out, long max_vals,
                      long skip_lines) {
    CLocaleGuard loc;
    FILE* f = fopen(path, "r");
    if (!f) return -1;
    setvbuf(f, nullptr, _IOFBF, 1 << 22);

    char line[4096];
    long n = 0;
    long lineno = 0;
    while (fgets(line, sizeof(line), f)) {
        // A line longer than the buffer would be delivered in chunks and
        // a number straddling the boundary silently parsed as two values:
        // reject instead (state lines are ~25 bytes/field * nvars).
        size_t len = strlen(line);
        if (len == sizeof(line) - 1 && line[len - 1] != '\n') {
            fclose(f);
            return -3;
        }
        lineno++;
        if (lineno <= skip_lines) continue;
        const char* p = line;
        while (*p) {
            char* end = nullptr;
            double val = strtod(p, &end);
            if (end == p) break;  // no number here (blank line / junk)
            if (n >= max_vals) { fclose(f); return -2; }
            out[n++] = val;
            p = end;
            while (*p == ',' || *p == ' ' || *p == '\t') p++;
            if (*p == '\n' || *p == '\r') break;
        }
    }
    fclose(f);
    return n;
}

// Count cells where |ref - ours| > max(atol, rtol*max(|ref|,|ours|))
// (Julia isapprox semantics, `reference_functions.jl:69-121`). Writes the
// max relative difference over differing cells to *max_rel.
long armon_count_differences(const double* ref, const double* ours, long n,
                             double atol, double rtol, double* max_rel) {
    long count = 0;
    double mr = 0.0;
    for (long i = 0; i < n; i++) {
        double a = ref[i], b = ours[i];
        double err = a > b ? a - b : b - a;
        double aa = a < 0 ? -a : a;
        double ab = b < 0 ? -b : b;
        double scale = aa > ab ? aa : ab;
        double tol = rtol * scale;
        if (tol < atol) tol = atol;
        // Negated comparison so NaN counts as a difference (Julia
        // !isapprox(NaN, x) semantics): err > tol is false for NaN.
        if (!(err <= tol)) {
            count++;
            double denom = aa > 0 ? aa : 5e-324;
            double rel = err / denom;
            if (rel > mr) mr = rel;
        }
    }
    *max_rel = mr;
    return count;
}

}  // extern "C"
