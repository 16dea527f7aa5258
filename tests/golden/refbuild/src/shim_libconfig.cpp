// Parser for the libconfig++ shim (see include/libconfig.h++).
// Recursive-descent over the libconfig grammar subset used by
// rtl_airband configuration files.
#include <libconfig.h++>

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>

namespace libconfig {

namespace {

struct Lexer {
    std::string src;
    size_t pos = 0;
    int line = 1;

    explicit Lexer(std::string s) : src(std::move(s)) {}

    [[noreturn]] void fail(const std::string& msg) const { throw ParseException(msg, line); }

    int peek() const { return pos < src.size() ? (unsigned char)src[pos] : -1; }
    int get() {
        int c = peek();
        if (c == '\n')
            line++;
        if (c != -1)
            pos++;
        return c;
    }

    void skip_ws() {
        for (;;) {
            int c = peek();
            if (c == -1)
                return;
            if (isspace(c)) {
                get();
            } else if (c == '#') {
                while (peek() != -1 && peek() != '\n')
                    get();
            } else if (c == '/' && pos + 1 < src.size() && src[pos + 1] == '/') {
                while (peek() != -1 && peek() != '\n')
                    get();
            } else if (c == '/' && pos + 1 < src.size() && src[pos + 1] == '*') {
                get();
                get();
                while (peek() != -1 && !(peek() == '*' && pos + 1 < src.size() && src[pos + 1] == '/'))
                    get();
                if (peek() == -1)
                    fail("unterminated comment");
                get();
                get();
            } else {
                return;
            }
        }
    }

    bool accept(char c) {
        skip_ws();
        if (peek() == c) {
            get();
            return true;
        }
        return false;
    }

    std::string ident() {
        skip_ws();
        std::string out;
        int c = peek();
        if (c == -1 || !(isalpha(c) || c == '*' || c == '_'))
            fail("expected setting name");
        while (c != -1 && (isalnum(c) || c == '_' || c == '-' || c == '*')) {
            out += (char)get();
            c = peek();
        }
        return out;
    }

    std::string string_lit() {
        std::string out;
        for (;;) {  // adjacent "a" "b" concatenation
            skip_ws();
            if (peek() != '"')
                break;
            get();
            for (;;) {
                int c = get();
                if (c == -1)
                    fail("unterminated string");
                if (c == '"')
                    break;
                if (c == '\\') {
                    int e = get();
                    switch (e) {
                        case 'n':
                            out += '\n';
                            break;
                        case 't':
                            out += '\t';
                            break;
                        case 'r':
                            out += '\r';
                            break;
                        case '\\':
                            out += '\\';
                            break;
                        case '"':
                            out += '"';
                            break;
                        default:
                            out += (char)e;
                    }
                } else {
                    out += (char)c;
                }
            }
        }
        return out;
    }
};

void parse_scalar(Lexer& lx, Setting* s) {
    lx.skip_ws();
    int c = lx.peek();
    if (c == '"') {
        s->set_string(lx.string_lit());
        return;
    }
    std::string tok;
    while (c != -1 && (isalnum(c) || c == '+' || c == '-' || c == '.' || c == 'x' || c == 'X')) {
        tok += (char)lx.get();
        c = lx.peek();
    }
    if (tok.empty())
        lx.fail("expected value");
    std::string low;
    for (char ch : tok)
        low += (char)tolower(ch);
    if (low == "true" || low == "yes" || low == "on") {
        // real libconfig only accepts true/false; accept close variants
        s->set_bool(true);
        return;
    }
    if (low == "false" || low == "no" || low == "off") {
        s->set_bool(false);
        return;
    }
    bool is_float = tok.find('.') != std::string::npos || ((tok.find('e') != std::string::npos || tok.find('E') != std::string::npos) && tok.compare(0, 2, "0x") != 0 && tok.compare(0, 2, "0X") != 0);
    if (is_float) {
        s->set_float(strtod(tok.c_str(), nullptr));
        return;
    }
    bool is64 = false;
    if (!tok.empty() && (tok.back() == 'L' || tok.back() == 'l')) {
        is64 = true;
        tok.pop_back();
        if (!tok.empty() && (tok.back() == 'L' || tok.back() == 'l'))
            tok.pop_back();
    }
    long long v = strtoll(tok.c_str(), nullptr, 0);
    if (v > 2147483647LL || v < -2147483648LL)
        is64 = true;
    s->set_int(v, is64);
    return;
}

// Type of the value at the cursor (after ws): group/list/array/scalar kind.
Setting::Type value_type(Lexer& lx) {
    lx.skip_ws();
    switch (lx.peek()) {
        case '{':
            return Setting::TypeGroup;
        case '(':
            return Setting::TypeList;
        case '[':
            return Setting::TypeArray;
        case '"':
            return Setting::TypeString;
        default:
            break;
    }
    // Peek a scalar token without consuming (parse_scalar will refine int/float/bool)
    return Setting::TypeInt;
}

void parse_value(Lexer& lx, Setting* s);

void parse_group_body(Lexer& lx, Setting* g, char closer) {
    for (;;) {
        lx.skip_ws();
        if (lx.peek() == -1) {
            if (closer == '\0')
                return;  // root group ends at EOF
            lx.fail("unexpected end of file");
        }
        if (closer != '\0' && lx.peek() == closer) {
            lx.get();
            return;
        }
        std::string name = lx.ident();
        lx.skip_ws();
        if (!(lx.accept('=') || lx.accept(':')))
            lx.fail("expected '=' or ':' after setting name");
        Setting* child = g->add_child(value_type(lx), name);
        parse_value(lx, child);
        lx.accept(';') || lx.accept(',');
    }
}

void parse_value(Lexer& lx, Setting* s) {
    lx.skip_ws();
    int c = lx.peek();
    if (c == '{') {
        lx.get();
        parse_group_body(lx, s, '}');
    } else if (c == '(' || c == '[') {
        char closer = c == '(' ? ')' : ']';
        lx.get();
        for (;;) {
            lx.skip_ws();
            if (lx.peek() == closer) {
                lx.get();
                break;
            }
            Setting* el = s->add_child(value_type(lx), "");
            parse_value(lx, el);
            lx.skip_ws();
            if (lx.peek() == ',') {
                lx.get();
            } else if (lx.peek() != closer) {
                lx.fail("expected ',' or closing bracket in list");
            }
        }
    } else {
        parse_scalar(lx, s);
    }
}

std::string read_file_or_throw(const char* path) {
    std::ifstream f(path, std::ios::binary);
    if (!f)
        throw FileIOException();
    std::ostringstream ss;
    ss << f.rdbuf();
    return ss.str();
}

// Expand @include "file" directives (one level; relative to cwd, which is
// how the reference's own configs use it).
std::string expand_includes(const std::string& src) {
    std::string out;
    size_t pos = 0;
    for (;;) {
        size_t at = src.find("@include", pos);
        if (at == std::string::npos) {
            out += src.substr(pos);
            return out;
        }
        out += src.substr(pos, at - pos);
        size_t q1 = src.find('"', at);
        size_t q2 = q1 == std::string::npos ? std::string::npos : src.find('"', q1 + 1);
        if (q2 == std::string::npos)
            return out + src.substr(at);
        out += read_file_or_throw(src.substr(q1 + 1, q2 - q1 - 1).c_str());
        pos = q2 + 1;
    }
}

}  // namespace

void Config::readFile(const char* path) {
    std::string src = expand_includes(read_file_or_throw(path));
    Lexer lx(std::move(src));
    parse_group_body(lx, root_.get(), '\0');
}

}  // namespace libconfig
