/* Minimal libconfig++-compatible API for building the reference out-of-tree
 * (no libconfig++ dev package in this image).  Implements exactly the
 * surface the reference consumes (reference: src/config.cpp, rtl_airband.cpp
 * :779-899, input-*.cpp): Config::readFile/getRoot/lookup, Setting with
 * exists/operator[]/getLength/getType/getName/getPath and scalar
 * conversions, plus the exception hierarchy.  The parser (shim_libconfig.cpp)
 * handles the libconfig grammar subset used by rtl_airband configs: groups
 * {…}, lists (…), arrays […], scalars (bool/int/int64/float/string),
 * '='/':' assignment, ';'/',' terminators, #, //, and C-style comments,
 * @include directives, and adjacent string concatenation.
 * This is our own implementation written to the public API — no libconfig
 * sources were used.
 */
#ifndef SHIM_LIBCONFIGXX_H
#define SHIM_LIBCONFIGXX_H

#include <exception>
#include <memory>
#include <string>
#include <vector>

namespace libconfig {

class ConfigException : public std::exception {
   public:
    explicit ConfigException(const std::string& what = "config exception") : what_(what) {}
    ~ConfigException() throw() override {}
    const char* what() const throw() override { return what_.c_str(); }

   protected:
    std::string what_;
};

class FileIOException : public ConfigException {
   public:
    FileIOException() : ConfigException("file I/O error") {}
};

class ParseException : public ConfigException {
   public:
    ParseException(const std::string& err, int line) : ConfigException("parse error: " + err), err_(err), line_(line) {}
    ~ParseException() throw() override {}
    const char* getError() const { return err_.c_str(); }
    int getLine() const { return line_; }

   private:
    std::string err_;
    int line_;
};

class SettingException : public ConfigException {
   public:
    explicit SettingException(const std::string& path) : ConfigException("setting error at " + path), path_(path) {}
    ~SettingException() throw() override {}
    const char* getPath() const { return path_.c_str(); }

   private:
    std::string path_;
};

class SettingNotFoundException : public SettingException {
   public:
    explicit SettingNotFoundException(const std::string& path) : SettingException(path) {}
};

class SettingTypeException : public SettingException {
   public:
    explicit SettingTypeException(const std::string& path) : SettingException(path) {}
};

class Setting {
   public:
    enum Type {
        TypeNone = 0,
        TypeInt,
        TypeInt64,
        TypeFloat,
        TypeString,
        TypeBoolean,
        TypeGroup,
        TypeArray,
        TypeList,
    };

    Setting(Type t, const std::string& name, Setting* parent) : type_(t), name_(name), parent_(parent), bval_(false), ival_(0), fval_(0.0) {}

    Type getType() const { return type_; }
    const char* getName() const { return name_.empty() ? nullptr : name_.c_str(); }
    std::string getPath() const {
        if (parent_ == nullptr)
            return name_;
        std::string pp = parent_->getPath();
        if (pp.empty())
            return name_;
        return name_.empty() ? pp : pp + "." + name_;
    }

    int getLength() const { return (int)children_.size(); }
    bool exists(const char* name) const { return find(name) != nullptr; }
    bool exists(const std::string& name) const { return find(name.c_str()) != nullptr; }

    Setting& operator[](const char* name) const {
        Setting* c = find(name);
        if (c == nullptr)
            throw SettingNotFoundException(getPath() + "." + name);
        return *c;
    }
    Setting& operator[](const std::string& name) const { return (*this)[name.c_str()]; }
    Setting& operator[](int idx) const {
        if (idx < 0 || idx >= (int)children_.size())
            throw SettingNotFoundException(getPath() + "[index]");
        return *children_[(size_t)idx];
    }

    // -- scalar conversions (lenient on int<->float like configs in the wild)
    operator bool() const {
        require_scalar();
        if (type_ == TypeBoolean)
            return bval_;
        if (type_ == TypeInt || type_ == TypeInt64)
            return ival_ != 0;
        throw SettingTypeException(getPath());
    }
    operator int() const {
        require_scalar();
        if (type_ == TypeInt || type_ == TypeInt64)
            return (int)ival_;
        throw SettingTypeException(getPath());
    }
    operator unsigned int() const { return (unsigned int)(int)(*this); }
    operator long() const { return (long)(long long)(*this); }
    operator unsigned long() const { return (unsigned long)(long long)(*this); }
    operator long long() const {
        require_scalar();
        if (type_ == TypeInt || type_ == TypeInt64)
            return ival_;
        throw SettingTypeException(getPath());
    }
    operator float() const { return (float)(double)(*this); }
    operator double() const {
        require_scalar();
        if (type_ == TypeFloat)
            return fval_;
        if (type_ == TypeInt || type_ == TypeInt64)
            return (double)ival_;
        throw SettingTypeException(getPath());
    }
    operator const char*() const { return c_str(); }
    operator std::string() const { return std::string(c_str()); }
    const char* c_str() const {
        if (type_ != TypeString)
            throw SettingTypeException(getPath());
        return sval_.c_str();
    }

    // -- construction helpers (parser only)
    Setting* add_child(Type t, const std::string& name) {
        children_.emplace_back(new Setting(t, name, this));
        return children_.back().get();
    }
    void set_bool(bool v) {
        bval_ = v;
        type_ = TypeBoolean;
    }
    void set_int(long long v, bool is64) {
        ival_ = v;
        type_ = is64 ? TypeInt64 : TypeInt;
    }
    void set_float(double v) {
        fval_ = v;
        type_ = TypeFloat;
    }
    void set_string(const std::string& v) {
        sval_ = v;
        type_ = TypeString;
    }

   private:
    void require_scalar() const {
        if (type_ == TypeGroup || type_ == TypeArray || type_ == TypeList || type_ == TypeNone)
            throw SettingTypeException(getPath());
    }
    Setting* find(const char* name) const {
        for (const auto& c : children_)
            if (c->name_ == name)
                return c.get();
        return nullptr;
    }

    Type type_;
    std::string name_;
    Setting* parent_;
    bool bval_;
    long long ival_;
    double fval_;
    std::string sval_;
    std::vector<std::unique_ptr<Setting>> children_;
};

class Config {
   public:
    Config() : root_(new Setting(Setting::TypeGroup, "", nullptr)) {}
    void readFile(const char* path);  // shim_libconfig.cpp
    Setting& getRoot() const { return *root_; }
    Setting& lookup(const char* path) const {
        Setting* s = root_.get();
        std::string p(path), part;
        size_t pos = 0;
        while (pos != std::string::npos) {
            size_t dot = p.find('.', pos);
            part = p.substr(pos, dot == std::string::npos ? std::string::npos : dot - pos);
            if (!s->exists(part))
                throw SettingNotFoundException(path);
            s = &(*s)[part];
            pos = dot == std::string::npos ? std::string::npos : dot + 1;
        }
        return *s;
    }
    Setting& lookup(const std::string& path) const { return lookup(path.c_str()); }
    bool exists(const char* path) const {
        try {
            lookup(path);
            return true;
        } catch (const SettingNotFoundException&) {
            return false;
        }
    }

   private:
    std::unique_ptr<Setting> root_;
};

}  // namespace libconfig

#endif /* SHIM_LIBCONFIGXX_H */
