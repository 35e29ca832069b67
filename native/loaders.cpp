// Native data loaders for linevis_tpu (C ABI, consumed via ctypes).
//
// The reference implements all file loaders in C++ with TBB
// (src/Loaders/*.cpp); Python tokenization of multi-hundred-MB .obj /
// stress .dat files is 20-50x slower, so the hot parsing paths live here.
// Build: native/build.sh -> native/liblinevis_loaders.so. The Python
// wrappers (linevis_tpu/native.py) fall back to pure Python when the
// library is missing.

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Fast whitespace-separated float tokenizer (stress .dat files).
// Returns number of floats parsed; caller frees with lv_free.
// ---------------------------------------------------------------------------
double* lv_parse_floats(const char* path, int64_t* out_count) {
    *out_count = 0;
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (fread(buf.data(), 1, size, f) != (size_t)size) {
        fclose(f);
        return nullptr;
    }
    fclose(f);
    buf[size] = '\0';

    std::vector<double> vals;
    vals.reserve(size / 6);
    char* p = buf.data();
    char* end = buf.data() + size;
    while (p < end) {
        while (p < end && std::isspace((unsigned char)*p)) p++;
        if (p >= end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) {
            // Non-numeric token (e.g. "major"): skip it.
            while (p < end && !std::isspace((unsigned char)*p)) p++;
            continue;
        }
        vals.push_back(v);
        p = next;
    }
    double* out = (double*)malloc(vals.size() * sizeof(double));
    memcpy(out, vals.data(), vals.size() * sizeof(double));
    *out_count = (int64_t)vals.size();
    return out;
}

// ---------------------------------------------------------------------------
// .obj line-set parser (reference format, README.md:144-153):
// v x y z | vt a... | l i j k... (1-based) | a name... | g ...
// Invalid points (|coord| > 1e10) are dropped like ObjLoader.cpp:142-147.
// ---------------------------------------------------------------------------
struct LvObjResult {
    float* positions;       // [total_points * 3]
    float* attributes;      // [total_points * num_attrs] (point-major)
    int64_t* line_offsets;  // [num_lines + 1]
    int64_t num_lines;
    int64_t total_points;
    int64_t num_attrs;
    char* attr_names;       // '\n'-separated
};

LvObjResult* lv_parse_obj(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (fread(buf.data(), 1, size, f) != (size_t)size) {
        fclose(f);
        return nullptr;
    }
    fclose(f);
    buf[size] = '\0';

    std::vector<float> verts;       // xyz triples
    std::vector<float> vattrs;      // per-vertex attributes (flat)
    int64_t num_attrs = 0;
    std::vector<float> out_pos;
    std::vector<float> out_attr;
    std::vector<int64_t> offsets;
    offsets.push_back(0);
    std::string attr_names;

    char* p = buf.data();
    char* end = buf.data() + size;
    const float MAX_VAL = 1e10f;
    while (p < end) {
        // Find line end.
        char* line_end = (char*)memchr(p, '\n', end - p);
        if (!line_end) line_end = end;
        char saved = *line_end;
        *line_end = '\0';

        if (p[0] == 'v' && (p[1] == ' ' || p[1] == '\t')) {
            char* q = p + 2;
            float x = strtof(q, &q);
            float y = strtof(q, &q);
            float z = strtof(q, &q);
            verts.push_back(x);
            verts.push_back(y);
            verts.push_back(z);
        } else if (p[0] == 'v' && p[1] == 't') {
            char* q = p + 2;
            int64_t n = 0;
            while (true) {
                char* next = nullptr;
                float v = strtof(q, &next);
                if (next == q) break;
                vattrs.push_back(v);
                q = next;
                n++;
            }
            num_attrs = n;
        } else if (p[0] == 'l' && (p[1] == ' ' || p[1] == '\t')) {
            char* q = p + 2;
            int64_t count = 0;
            while (true) {
                char* next = nullptr;
                long idx = strtol(q, &next, 10);
                if (next == q) break;
                q = next;
                int64_t vi = idx - 1;
                if (vi < 0 || (size_t)(vi * 3 + 2) >= verts.size()) continue;
                float x = verts[vi * 3], y = verts[vi * 3 + 1], z = verts[vi * 3 + 2];
                if (x > MAX_VAL || x < -MAX_VAL || y > MAX_VAL || y < -MAX_VAL ||
                    z > MAX_VAL || z < -MAX_VAL)
                    continue;
                out_pos.push_back(x);
                out_pos.push_back(y);
                out_pos.push_back(z);
                for (int64_t a = 0; a < num_attrs; a++)
                    out_attr.push_back(vattrs[vi * num_attrs + a]);
                count++;
            }
            offsets.push_back(offsets.back() + count);
        } else if (p[0] == 'a' && (p[1] == ' ' || p[1] == '\t')) {
            if (attr_names.empty()) {
                attr_names.assign(p + 2);
                for (auto& c : attr_names)
                    if (c == ' ' || c == '\t') c = '\n';
            }
        }
        *line_end = saved;
        p = line_end + 1;
    }

    LvObjResult* r = (LvObjResult*)malloc(sizeof(LvObjResult));
    r->num_lines = (int64_t)offsets.size() - 1;
    r->total_points = (int64_t)(out_pos.size() / 3);
    r->num_attrs = num_attrs;
    r->positions = (float*)malloc(out_pos.size() * sizeof(float));
    memcpy(r->positions, out_pos.data(), out_pos.size() * sizeof(float));
    r->attributes = (float*)malloc(out_attr.size() * sizeof(float));
    memcpy(r->attributes, out_attr.data(), out_attr.size() * sizeof(float));
    r->line_offsets = (int64_t*)malloc(offsets.size() * sizeof(int64_t));
    memcpy(r->line_offsets, offsets.data(), offsets.size() * sizeof(int64_t));
    r->attr_names = (char*)malloc(attr_names.size() + 1);
    memcpy(r->attr_names, attr_names.c_str(), attr_names.size() + 1);
    return r;
}

void lv_free(void* p) { free(p); }

void lv_free_obj(LvObjResult* r) {
    if (!r) return;
    free(r->positions);
    free(r->attributes);
    free(r->line_offsets);
    free(r->attr_names);
    free(r);
}

}  // extern "C"
