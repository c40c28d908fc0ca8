// GIL-correct replacement for the reference's learner/pybind.cpp, exposing
// the IDENTICAL `minizero_py` module API so the reference's UNMODIFIED
// train.py runs on this image (cross-framework head-to-head, VERDICT r3 #8).
//
// Why not compile the reference's own pybind.cpp? Its sample_data /
// update_priority lambdas run under py::call_guard<py::gil_scoped_release>
// and call py::array::request() — i.e. PyObject_GetBuffer — WITHOUT the
// GIL. Python 3.8 (the reference's target) tolerated that; this image's
// Python 3.12 segfaults in libpython. This binding takes the buffer
// pointers while still holding the GIL and releases it only around the pure
// C++ work (load / sample), which is the documented pybind11 pattern.
//
// All behavior behind the API is the reference's real DataLoader /
// ReplayBuffer (learner/data_loader.cpp), compiled in place.

#include "configuration.h"
#include "configure_loader.h"
#include "data_loader.h"
#include "environment.h"
#include <pybind11/numpy.h>
#include <pybind11/pybind11.h>
#include <pybind11/stl.h>
#include <memory>
#include <string>

namespace py = pybind11;
using namespace minizero;

static std::shared_ptr<Environment> kEnvInstance;

static Environment& getEnvInstance()
{
    if (!kEnvInstance) { kEnvInstance = std::make_shared<Environment>(); }
    return *kEnvInstance;
}

static float* ptr_or_null(py::object o)
{
    if (o.is_none()) { return nullptr; }
    return static_cast<float*>(py::cast<py::array_t<float>>(o).request().ptr);
}

PYBIND11_MODULE(minizero_py, m)
{
    m.def("load_config_file", [](std::string file_name) {
        minizero::env::setUpEnv();
        minizero::config::ConfigureLoader cl;
        minizero::config::setConfiguration(cl);
        bool success = cl.loadFromFile(file_name);
        if (success) { kEnvInstance = std::make_shared<Environment>(); }
        return success;
    });
    m.def("load_config_string", [](std::string conf_str) {
        minizero::config::ConfigureLoader cl;
        minizero::config::setConfiguration(cl);
        bool success = cl.loadFromString(conf_str);
        if (success) { kEnvInstance = std::make_shared<Environment>(); }
        return success;
    });
    m.def("use_gumbel", []() { return config::actor_use_gumbel; });
    m.def("get_zero_replay_buffer", []() { return config::zero_replay_buffer; });
    m.def("use_per", []() { return config::learner_use_per; });
    m.def("get_training_step", []() { return config::learner_training_step; });
    m.def("get_training_display_step", []() { return config::learner_training_display_step; });
    m.def("get_batch_size", []() { return config::learner_batch_size; });
    m.def("get_muzero_unrolling_step", []() { return config::learner_muzero_unrolling_step; });
    m.def("get_n_step_return", []() { return config::learner_n_step_return; });
    m.def("get_optimizer", []() { return config::learner_optimizer; });
    m.def("get_learning_rate", []() { return config::learner_learning_rate; });
    m.def("get_momentum", []() { return config::learner_momentum; });
    m.def("get_weight_decay", []() { return config::learner_weight_decay; });
    m.def("get_value_loss_scale", []() { return config::learner_value_loss_scale; });
    m.def("get_game_name", []() { return getEnvInstance().name(); });
    m.def("get_nn_num_input_channels", []() { return getEnvInstance().getNumInputChannels(); });
    m.def("get_nn_input_channel_height", []() { return getEnvInstance().getInputChannelHeight(); });
    m.def("get_nn_input_channel_width", []() { return getEnvInstance().getInputChannelWidth(); });
    m.def("get_nn_num_hidden_channels", []() { return config::nn_num_hidden_channels; });
    m.def("get_nn_hidden_channel_height", []() { return getEnvInstance().getHiddenChannelHeight(); });
    m.def("get_nn_hidden_channel_width", []() { return getEnvInstance().getHiddenChannelWidth(); });
    m.def("get_nn_num_action_feature_channels", []() { return getEnvInstance().getNumActionFeatureChannels(); });
    m.def("get_nn_num_blocks", []() { return config::nn_num_blocks; });
    m.def("get_nn_action_size", []() { return getEnvInstance().getPolicySize(); });
    m.def("get_nn_num_value_hidden_channels", []() { return config::nn_num_value_hidden_channels; });
    m.def("get_nn_discrete_value_size", []() { return kEnvInstance->getDiscreteValueSize(); });
    m.def("get_nn_type_name", []() { return config::nn_type_name; });

    py::class_<learner::DataLoader>(m, "DataLoader")
        .def(py::init<std::string>())
        .def("initialize", &learner::DataLoader::initialize)
        .def("load_data_from_file", [](learner::DataLoader& dl, std::string file_name) {
            py::gil_scoped_release release;  // pure C++ parse + buffer fill
            dl.loadDataFromFile(file_name);
        })
        .def("update_priority", [](learner::DataLoader& dl, py::array_t<int> sampled_index, py::array_t<float> batch_values) {
            int* si = static_cast<int*>(sampled_index.request().ptr);      // GIL held
            float* bv = static_cast<float*>(batch_values.request().ptr);
            py::gil_scoped_release release;
            dl.updatePriority(si, bv);
        })
        .def("sample_data", [](learner::DataLoader& dl, py::object features, py::object action_features, py::object policy, py::object value, py::object reward, py::object loss_scale, py::object sampled_index) {
            auto data = dl.getSharedData()->getDataPtr();                  // GIL held
            data->features_ = ptr_or_null(features);
            data->action_features_ = ptr_or_null(action_features);
            data->policy_ = ptr_or_null(policy);
            data->value_ = ptr_or_null(value);
            data->reward_ = ptr_or_null(reward);
            data->loss_scale_ = ptr_or_null(loss_scale);
            data->sampled_index_ = sampled_index.is_none()
                ? nullptr
                : static_cast<int*>(py::cast<py::array_t<int>>(sampled_index).request().ptr);
            py::gil_scoped_release release;
            dl.sampleData();
        });
}
